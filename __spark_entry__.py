"""Driver contract for the spark-graft builder (PySpark target).

queries() run the real pipeline (pandas-UDF regex parse, window
repair/assembly, range-partitioned merge); oracle_sql() computes the
same answers in DuckDB *by construction* from the deterministic
transcripts derivation (super_speedy_syslog_searcher_spark.datagen) —
two independent computation paths, the reference's
compare-current-and-expected strategy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark import oracle as O
from super_speedy_syslog_searcher_spark import pipeline as P
from super_speedy_syslog_searcher_spark import session
from super_speedy_syslog_searcher_spark.datagen import transcripts_df
from super_speedy_syslog_searcher_spark.operators import (
    bpe,
    cluster,
    graph,
    lines,
    pq,
    rank,
    sft,
    dedup,
    multimodal,
    similarity,
    sketch,
    stats,
    temporal,
    textstats,
    transforms,
)
from super_speedy_syslog_searcher_spark.operators.enrich import enrich_stage
from super_speedy_syslog_searcher_spark.operators.merge import (
    dt_filter,
    with_global_seq,
)

DT_AFTER = "2024-01-10 00:00:00"
DT_BEFORE = "2024-01-20 00:00:00"


def _t(spark: SparkSession, sf_dir: str) -> DataFrame:
    session.prep(spark)
    return transcripts_df(spark, sf_dir)


# --------------------------------------------------------------- queries

def q_parse_extract(spark, sf_dir):
    """Pattern-bank datetime extraction + repair (SURVEY §2.2/§2.3)."""
    df = P.parse_repair(_t(spark, sf_dir))
    return df.select(
        "conv_id",
        "turn_idx",
        "ts_parsed",
        F.col("pattern_id").cast("int").alias("pattern_id"),
        "sink",
        F.col("dt_beg").cast("int").alias("dt_beg"),
        F.col("dt_end").cast("int").alias("dt_end"),
    )


def q_merge_ordered(spark, sf_dir):
    """The flagship: dt-filtered globally ordered merge (§2.7).

    full_merge output is already range-sorted; ordered=True makes
    with_global_seq attach seq numbers without re-sorting (one sort,
    one lineage)."""
    merged = P.full_merge(_t(spark, sf_dir), DT_AFTER, DT_BEFORE)
    return with_global_seq(merged, ordered=True).select(
        F.col("msg_seq").cast("bigint").alias("msg_seq"),
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "text",
        "ts_eff",
    )


def q_pattern_counts(spark, sf_dir):
    return stats.pattern_counts(P.parse_repair(_t(spark, sf_dir), narrow=True))


def q_sink_counts(spark, sf_dir):
    return stats.sink_counts(P.assembled(_t(spark, sf_dir), narrow=True))


def q_hourly_hist(spark, sf_dir):
    return stats.hourly_histogram(P.assembled(_t(spark, sf_dir), narrow=True))


def q_conv_summary(spark, sf_dir):
    df = stats.conv_summary(P.parse_repair(_t(spark, sf_dir), narrow=True))
    return df.select(
        "conv_id",
        F.col("turns").cast("bigint").alias("turns"),
        F.col("syslines").cast("bigint").alias("syslines"),
        F.col("longest_line").cast("int").alias("longest_line"),
        "dt_first",
        "dt_last",
        F.col("out_of_order").cast("bigint").alias("out_of_order"),
    )


def q_routed_enriched(spark, sf_dir):
    """Broadcast-dim enrich + per-sink routed tallies (§2.4, route)."""
    df = enrich_stage(P.assembled(_t(spark, sf_dir), narrow=True))
    return df.groupBy(
        F.col("sink_eff").alias("sink"), "role_kind"
    ).agg(
        F.count("*").cast("bigint").alias("rows"),
        F.sum(F.when(F.col("is_agentic"), 1).otherwise(0))
        .cast("bigint")
        .alias("agentic_rows"),
        F.sum("role_weight").cast("bigint").alias("weight_sum"),
    )


def q_global_summary(spark, sf_dir):
    df = stats.global_summary(P.assembled(_t(spark, sf_dir), narrow=True))
    return df.select(
        F.col("rows_total").cast("bigint").alias("rows_total"),
        F.col("syslines_total").cast("bigint").alias("syslines_total"),
        F.col("bytes_texts").cast("bigint").alias("bytes_texts"),
        "dt_first",
        "dt_last",
        F.col("convs").cast("bigint").alias("convs"),
    )


def q_sysline_assembly(spark, sf_dir):
    """Continuation-line attachment (§2.6 sysline assembly)."""
    df = P.assembled(_t(spark, sf_dir), narrow=True)
    return (
        df.filter(F.col("msg_turn_idx").isNotNull())
        .groupBy("conv_id", F.col("msg_turn_idx").cast("int").alias("msg_turn_idx"))
        .agg(F.count("*").cast("bigint").alias("lines"))
    )


def q_dt_window_sinks(spark, sf_dir):
    """dt-range filter pushdown + per-sink counts (binary-search
    analogue, §2.7)."""
    df = dt_filter(P.assembled(_t(spark, sf_dir), narrow=True), DT_AFTER, DT_BEFORE)
    return df.groupBy(F.col("sink_eff").alias("sink")).agg(
        F.count("*").cast("bigint").alias("rows")
    )


def q_conv_dominant_pattern(spark, sf_dir):
    """s4 dt_patterns_analysis: learned per-conv dominant pattern."""
    return stats.conv_dominant_pattern(
        P.parse_repair(_t(spark, sf_dir), narrow=True)
    )


def q_union_merge(spark, sf_dir):
    """Multi-source union → ordered merge (SURVEY §2.8 set ops under
    the driver oracle): the transcripts table unions with a second
    derived source (same lines, 'alt-'-prefixed conversations — the
    analogue of handing s4 the same file twice under different
    paths), then runs the full dt-filtered global merge.  Every turn
    ties with its twin on ts_eff, so the query also pins the
    deterministic tie-break (ts_eff, conv_id, turn_idx) at 2× scale."""
    t = _t(spark, sf_dir)
    # same multiset as t UNION ALL ('alt-'-prefixed t), but via one
    # explode instead of a self-union: the union form evaluated the
    # whole transcripts derivation (two datagen window stages + the
    # 58-family text projection) TWICE — one subtree per union arm —
    # measured 2.4x slower end-to-end (guide §1.2: don't compute
    # things twice)
    dup = t.select(
        F.explode(F.array(F.lit(""), F.lit("alt-"))).alias("_pfx"),
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ).select(
        F.concat(F.col("_pfx"), F.col("conv_id")).alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    )
    merged = P.full_merge(dup, DT_AFTER, DT_BEFORE)
    return with_global_seq(merged, ordered=True).select(
        F.col("msg_seq").cast("bigint").alias("msg_seq"),
        "conv_id",
        "turn_idx",
        "ts_eff",
    )


def q_logfile_merge(spark, sf_dir):
    """Raw log-FILE source end-to-end under the driver oracle — the
    analogue of the reference's file-corpus golden run
    (tools/compare-current-and-expected/compare.sh): the transcripts
    derivation is written out as REAL log files (plain UTF-8, gzip,
    UTF-16LE-with-BOM — one per conv bucket, lines in (conv, turn)
    order), read back through sources/logfiles.read_log_files_decoded
    (BOM sniff + codec + mapInPandas line split), re-parsed with the
    pattern bank, and tallied per (file, sink).  The oracle computes
    the same tallies from the by-construction expected parses with
    the same bucket assignment — two fully independent paths from the
    same derivation.

    The fixture write collects the derived lines to the driver —
    test-scoped (sf0.01 ≈ 1 MB); a cluster run would write the files
    with a distributed writer instead.
    """
    import gzip
    import os
    import tempfile

    from super_speedy_syslog_searcher_spark.operators.parse import (
        parse_stage,
    )
    from super_speedy_syslog_searcher_spark.sources.logfiles import (
        read_log_files_decoded,
    )

    session.prep(spark)
    t = _t(spark, sf_dir)
    rows = (
        t.select(
            (F.substring("conv_id", 6, 5).cast("int") % 3).alias("fb"),
            "conv_id",
            "turn_idx",
            "text",
        )
        .orderBy("fb", "conv_id", "turn_idx")
        .collect()
    )
    by_bucket = {0: [], 1: [], 2: []}
    for r in rows:
        by_bucket[r["fb"]].append(r["text"])
    d = tempfile.mkdtemp(prefix="s4logfiles_")
    p0 = os.path.join(d, "f0.log")
    with open(p0, "w", encoding="utf-8", newline="\n") as f:
        f.write("\n".join(by_bucket[0]) + "\n")
    p1 = os.path.join(d, "f1.log.gz")
    with open(p1, "wb") as f:
        f.write(
            gzip.compress(("\n".join(by_bucket[1]) + "\n").encode("utf-8"))
        )
    p2 = os.path.join(d, "f2_utf16.log")
    with open(p2, "wb") as f:
        f.write(
            b"\xff\xfe"
            + ("\n".join(by_bucket[2]) + "\n").encode("utf-16-le")
        )
    src = read_log_files_decoded(spark, [p0, p1, p2])
    parsed = parse_stage(src)
    # raw parse only (no repair): uptime/no-year timestamps are
    # finalized by the conv-scoped repair stage, which keys on the
    # ORIGINAL conversations — the file source regroups rows by file,
    # so the comparable signals are sink routing and ts presence
    return parsed.groupBy(
        F.regexp_extract("conv_id", r"(f\d)[._]", 1).alias("file_label"),
        "sink",
    ).agg(
        F.count("*").cast("bigint").alias("rows"),
        F.count("ts_parsed").cast("bigint").alias("ts_rows"),
    )


def q_fixedstruct_records(spark, sf_dir):
    """Typed fixed-struct binary decode under the driver oracle: a
    deterministic utmp corpus is derived from the events table
    (ut_pid=event_id, ut_user/host from user_id, login time = event
    ts), packed into REAL glibc-layout 384-byte records
    (operators/fixedstruct.encode_records), written as two .utmp
    files, then decoded back through read_fixedstruct (binaryFile →
    numpy frombuffer in mapInPandas — fixedstructreader.rs:190-215's
    entry-sized block protocol).  The oracle derives the same records
    straight from events — the packed bytes round-trip is the unit
    under test.  Fixture write is driver-side and test-scoped
    (sf0.01 ≈ 3.8 MB)."""
    import os
    import tempfile

    from super_speedy_syslog_searcher_spark.operators.fixedstruct import (
        encode_records,
        read_fixedstruct,
    )

    session.prep(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = (
        ev.select(
            (F.col("event_id") % 2).cast("int").alias("fb"),
            F.col("event_id").alias("e"),
            F.col("user_id").alias("u"),
            F.unix_micros(
                F.col("ts").cast("timestamp")
            ).alias("eus"),
        )
        .orderBy("fb", "e")
        .collect()
    )
    recs = {0: [], 1: []}
    for r in rows:
        recs[r["fb"]].append(
            {
                "ut_type": 8 if r["e"] % 4 == 0 else 7,
                "ut_pid": r["e"],
                "ut_line": f"pts/{r['e'] % 16}",
                "ut_user": f"user{r['u'] % 10}",
                "ut_host": f"host-{r['u'] % 10}",
                "tv_sec": r["eus"] // 1_000_000,
                "tv_usec": r["eus"] % 1_000_000,
            }
        )
    d = tempfile.mkdtemp(prefix="s4utmp_")
    paths = []
    for fb, rr in recs.items():
        p = os.path.join(d, f"f{fb}.utmp")
        with open(p, "wb") as f:
            f.write(encode_records(rr))
        paths.append(p)
    out = read_fixedstruct(spark, paths)
    return out.select(
        F.regexp_extract("source", r"(f\d)\.utmp", 1).alias("source_label"),
        F.col("rec_idx").cast("int").alias("rec_idx"),
        F.col("ut_type").cast("int").alias("ut_type"),
        F.col("ut_pid").cast("int").alias("ut_pid"),
        "ut_line",
        "ut_user",
        "ut_host",
        "ts",
    )


def _binary_fixture_rows(spark, sf_dir):
    """Shared events-table derivation for the binary fixtures (two
    files keyed by event_id parity; same rows feed q_evtx_records,
    q_journal_records and their streaming twins)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.select(
            (F.col("event_id") % 2).cast("int").alias("fb"),
            F.col("event_id").alias("e"),
            F.col("user_id").alias("u"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("eus"),
        )
        .orderBy("fb", "e")
        .collect()
    )


def _write_evtx_fixtures(spark, sf_dir, d, compress_f1=False):
    """Write the deterministic two-file .evtx corpus into ``d``.
    compress_f1=True writes f1 as .evtx.xz — exercising the
    compressed-variant routing (batch _decompress and the widened
    streaming pathGlobFilter)."""
    import lzma
    import os

    from super_speedy_syslog_searcher_spark.operators.evtx import (
        encode_evtx,
    )

    files = {0: [], 1: []}
    for r in _binary_fixture_rows(spark, sf_dir):
        tus = r["eus"] - (3_600_000_000 if r["e"] % 7 == 0 else 0)
        files[r["fb"]].append(
            {
                "record_id": r["e"] + 1,
                "ts_us": tus,
                "payload": (
                    f"<Event><EventID>{r['e']}</EventID>"
                    f"<Provider>prov{r['u'] % 10}</Provider></Event>"
                ),
            }
        )
    paths = []
    for fb, rr in files.items():
        data = encode_evtx(rr)
        if compress_f1 and fb == 1:
            p = os.path.join(d, f"f{fb}.evtx.xz")
            data = lzma.compress(data)
        else:
            p = os.path.join(d, f"f{fb}.evtx")
        with open(p, "wb") as f:
            f.write(data)
        paths.append(p)
    return paths


def _write_journal_fixtures(spark, sf_dir, d, compress_f1=False):
    """Write the deterministic two-file .journal corpus into ``d``
    (compress_f1=True → f1.journal.gz)."""
    import gzip
    import os

    from super_speedy_syslog_searcher_spark.operators.journal import (
        encode_journal,
    )

    files = {0: [], 1: []}
    for r in _binary_fixture_rows(spark, sf_dir):
        files[r["fb"]].append(
            {
                "seqnum": r["e"] + 1,
                "ts_us": r["eus"],
                "monotonic_us": r["eus"] % 86_400_000_000,
                "fields": {
                    "MESSAGE": f"svc event {r['e']}",
                    "_HOSTNAME": f"host{r['u'] % 5}",
                    "SYSLOG_IDENTIFIER": f"daemon{r['e'] % 3}",
                    "_PID": str(100 + r["u"] % 50),
                },
            }
        )
    paths = []
    for fb, rr in files.items():
        data = encode_journal(rr)
        if compress_f1 and fb == 1:
            p = os.path.join(d, f"f{fb}.journal.gz")
            data = gzip.compress(data)
        else:
            p = os.path.join(d, f"f{fb}.journal")
        with open(p, "wb") as f:
            f.write(data)
        paths.append(p)
    return paths


def q_streaming_evtx(spark, sf_dir):
    """Structured-Streaming EVTX ingestion under the driver oracle:
    the same deterministic two-file corpus as q_evtx_records — with
    f1 written as .evtx.xz to prove the compressed variant streams
    too — decoded through read_evtx_stream (binaryFile file stream →
    per-file chunk walk in mapInPandas), drained with
    Trigger.AvailableNow to parquet, and compared against the
    events-derived oracle.  Raw enumeration-order records (the
    re-sort + ooo counter is the batch resort_with_ooo stage — a
    global window a file stream cannot produce mid-flight)."""
    import tempfile

    from super_speedy_syslog_searcher_spark.operators.evtx import (
        run_evtx_stream_available_now,
    )

    session.prep(spark)
    in_dir = tempfile.mkdtemp(prefix="s4sevtx_in_")
    out_dir = tempfile.mkdtemp(prefix="s4sevtx_out_")
    ck = tempfile.mkdtemp(prefix="s4sevtx_ck_")
    _write_evtx_fixtures(spark, sf_dir, in_dir, compress_f1=True)
    run_evtx_stream_available_now(spark, in_dir, out_dir, ck)
    out = spark.read.parquet(out_dir)
    return out.select(
        F.regexp_extract("source", r"(f\d)\.evtx", 1).alias(
            "source_label"
        ),
        F.col("rec_idx").cast("int").alias("rec_idx"),
        F.col("record_id").cast("long").alias("record_id"),
        "ts",
        "payload",
        F.col("payload_len").cast("int").alias("payload_len"),
    )


def q_streaming_journal(spark, sf_dir):
    """Structured-Streaming journal ingestion under the driver
    oracle — q_journal_records' corpus (f1 as .journal.gz) through
    read_journal_stream + AvailableNow drain; see q_streaming_evtx."""
    import tempfile

    from super_speedy_syslog_searcher_spark.operators.journal import (
        run_journal_stream_available_now,
    )

    session.prep(spark)
    in_dir = tempfile.mkdtemp(prefix="s4sjrnl_in_")
    out_dir = tempfile.mkdtemp(prefix="s4sjrnl_out_")
    ck = tempfile.mkdtemp(prefix="s4sjrnl_ck_")
    _write_journal_fixtures(spark, sf_dir, in_dir, compress_f1=True)
    run_journal_stream_available_now(spark, in_dir, out_dir, ck)
    out = spark.read.parquet(out_dir)
    return out.select(
        F.regexp_extract("source", r"(f\d)\.journal", 1).alias(
            "source_label"
        ),
        F.col("rec_idx").cast("int").alias("rec_idx"),
        F.col("seqnum").cast("long").alias("seqnum"),
        "ts",
        F.col("monotonic_us").cast("long").alias("monotonic_us"),
        "message",
        "hostname",
        "identifier",
        F.col("pid").cast("int").alias("pid"),
    )


def q_etl_records(spark, sf_dir):
    """Windows ETL binary decode under the driver oracle: a
    deterministic two-file corpus derives from the events table
    (EVENT_HEADER records with provider GUIDs, tids/pids and payload
    lengths from event columns; QPC stamps anchored to a fixed
    logfile-header StartTime), encoded into real WMI-buffer ETL bytes
    (operators/etl.encode_etl) and decoded back through read_etl.
    The renderer is separately proven byte-identical (modulo the
    vendored renderer's memory-address token) on the reference's own
    expected .etl output (tests/test_etl.py).  The oracle derives
    identical records straight from events; the logfile-header event
    (rec_idx 0) is excluded as fixture scaffolding."""
    import os
    import tempfile

    from super_speedy_syslog_searcher_spark.operators.etl import (
        encode_etl,
        read_etl,
    )

    session.prep(spark)
    START_US = 1_500_000_000_000_000
    files = {0: [], 1: []}
    for r in _binary_fixture_rows(spark, sf_dir):
        e, u = r["e"], r["u"]
        files[r["fb"]].append(
            {
                "ts_us": r["eus"],
                "provider": (
                    f"00000000-0000-4000-8000-{u % 1000:012d}"
                ),
                "tid": 100 + u % 50,
                "pid": 4000 + r["fb"],
                "version": e % 3,
                "payload": b"p" * (e % 50),
            }
        )
    d = tempfile.mkdtemp(prefix="s4etl_")
    paths = []
    for fb, rr in files.items():
        p = os.path.join(d, f"f{fb}.etl")
        with open(p, "wb") as f:
            f.write(encode_etl(rr, start_us=START_US))
        paths.append(p)
    out = read_etl(spark, paths)
    return out.filter(F.col("rec_idx") > 0).select(
        F.regexp_extract("source", r"(f\d)\.etl", 1).alias(
            "source_label"
        ),
        (F.col("rec_idx") - 1).cast("int").alias("rec_idx"),
        "ts",
        "kind",
        "provider_id",
        F.col("thread_id").cast("int").alias("thread_id"),
        F.col("process_id").cast("int").alias("process_id"),
        F.col("payload_len").cast("int").alias("payload_len"),
    )


def q_asl_records(spark, sf_dir):
    """Apple ASL binary decode under the driver oracle: a
    deterministic two-store corpus derives from the events table
    (record id = event_id+1, time/nanos from ts, level = e%8,
    inline AND string-record refs both exercised), encoded into real
    big-endian ASL bytes (operators/asl.encode_asl — 'ASL DB'
    header, chained message records, inline-string refs) and decoded
    back through read_asl (binaryFile → chain walk in mapInPandas).
    The renderer is separately proven byte-identical on the
    reference's own expected .asl output (tests/test_asl.py).  The
    oracle derives identical records straight from events."""
    import os
    import tempfile

    from super_speedy_syslog_searcher_spark.operators.asl import (
        encode_asl,
        read_asl,
    )

    session.prep(spark)
    files = {0: [], 1: []}
    for r in _binary_fixture_rows(spark, sf_dir):
        e, u = r["e"], r["u"]
        files[r["fb"]].append(
            {
                "rid": e + 1,
                "ts_us": r["eus"],
                "level": e % 8,
                "pid": 100 + u % 50,
                "uid": u % 3,
                "gid": 0,
                "ruid": 0xFFFFFFFF if e % 2 == 0 else u % 100,
                "rgid": 80,
                "host": f"host{u % 5}",
                "sender": f"daemon{e % 3}",
                "facility": f"com.example.fac{e % 4}",
                "message": f"asl event {e} fired",
                "kvs": [
                    ("Key.One", f"val{e % 9}"),
                    ("K2", f"w{u % 7}"),
                ],
            }
        )
    d = tempfile.mkdtemp(prefix="s4asl_")
    paths = []
    for fb, rr in files.items():
        p = os.path.join(d, f"f{fb}.asl")
        with open(p, "wb") as f:
            f.write(encode_asl(rr))
        paths.append(p)
    out = read_asl(spark, paths)
    return out.select(
        F.regexp_extract("source", r"(f\d)\.asl", 1).alias(
            "source_label"
        ),
        F.col("rec_idx").cast("int").alias("rec_idx"),
        F.col("rid").cast("long").alias("rid"),
        "ts",
        F.col("level").cast("int").alias("level"),
        "level_name",
        F.col("pid").cast("int").alias("pid"),
        F.col("uid").cast("int").alias("uid"),
        F.col("read_uid").cast("long").alias("read_uid"),
        "host",
        "sender",
        "facility",
        "message",
        "extras",
    )


def q_odl_records(spark, sf_dir):
    """OneDrive ODL binary decode under the driver oracle: a
    deterministic ODL corpus derives from the events table (ts_ms =
    event ts in epoch ms, code_file/function/line/params from event
    columns), encoded into real ODL bytes — EBFGONED header + 32-byte
    0xFFEEDDCC blocks (operators/odl.encode_odl; one file plain .odl,
    one gzip-bodied .odlgz) — and decoded back through read_odl
    (binaryFile → container walk in mapInPandas).  The renderer these
    records flow through is separately proven byte-identical on the
    reference's own three expected-output ODL files
    (tests/test_odl.py).  The oracle derives identical records
    straight from events."""
    import os
    import tempfile

    from super_speedy_syslog_searcher_spark.operators.odl import (
        encode_odl,
        read_odl,
    )

    session.prep(spark)
    files = {0: [], 1: []}
    for r in _binary_fixture_rows(spark, sf_dir):
        files[r["fb"]].append(
            {
                "ts_ms": r["eus"] // 1000,
                "code_file": f"Module{r['e'] % 7}.cpp",
                "line": r["e"] % 1000,
                "function": f"Ns::Class::Fn{r['u'] % 11}",
                "params": (
                    [f"event {r['e']} marker", f"user{r['u'] % 100:02d}"]
                    if r["e"] % 3 else []
                ),
                "pid": 4000 + r["fb"],
                "tid": 100 + r["u"] % 50,
            }
        )
    d = tempfile.mkdtemp(prefix="s4odl_")
    paths = []
    for fb, rr in files.items():
        p = os.path.join(d, f"f{fb}.odl" + ("gz" if fb else ""))
        with open(p, "wb") as f:
            f.write(encode_odl(rr, gz=bool(fb)))
        paths.append(p)
    out = read_odl(spark, paths)
    return out.select(
        F.regexp_extract("source", r"(f\d)\.a?odl", 1).alias(
            "source_label"
        ),
        F.col("rec_idx").cast("int").alias("rec_idx"),
        "ts",
        F.col("pid").cast("int").alias("pid"),
        F.col("tid").cast("int").alias("tid"),
        "code_file",
        F.col("line").cast("int").alias("line"),
        "function",
        "params",
    )


def q_evtx_records(spark, sf_dir):
    """Real .evtx binary decode under the driver oracle: a
    deterministic event-log corpus derives from the events table
    (record_id = event_id+1, written-time = event ts with every 7th
    record pushed 1 h backwards to exercise the out-of-order path,
    payload = an XML string), encoded into REAL EVTX bytes — 4 KiB
    file header, 64 KiB ElfChnk chunks, 24-byte record headers with
    FILETIME stamps and CRC32 checksums (operators/evtx.encode_evtx)
    — written as two .evtx files, decoded back through read_evtx
    (binaryFile → chunk walk in mapInPandas; evtxreader.rs:101-238),
    then re-sorted with the EvtxReader BTreeMap ordering and the
    :458-462 out_of_order counter as window functions.  The oracle
    derives identical records straight from events — the binary
    round-trip, FILETIME conversion, re-sort and ooo flags are the
    units under test."""
    import os
    import tempfile

    from super_speedy_syslog_searcher_spark.operators.evtx import (
        encode_evtx,
        read_evtx,
        resort_with_ooo,
    )

    session.prep(spark)
    d = tempfile.mkdtemp(prefix="s4evtx_")
    paths = _write_evtx_fixtures(spark, sf_dir, d)
    out = resort_with_ooo(read_evtx(spark, paths))
    return out.select(
        F.regexp_extract("source", r"(f\d)\.evtx", 1).alias("source_label"),
        F.col("rec_idx").cast("int").alias("rec_idx"),
        F.col("record_id").cast("long").alias("record_id"),
        "ts",
        "payload",
        F.col("payload_len").cast("int").alias("payload_len"),
        F.col("ooo").cast("int").alias("ooo"),
        F.col("sorted_idx").cast("int").alias("sorted_idx"),
    )


# -------------------------------------------- training-data pipeline ops

def q_journal_records(spark, sf_dir):
    """Real systemd .journal binary decode under the driver oracle: a
    deterministic journal corpus derives from the events table
    (seqnum = event_id+1, realtime = event ts, MESSAGE/_HOSTNAME/
    SYSLOG_IDENTIFIER/_PID fields from event columns), encoded into
    REAL journal bytes — LPKSHHRH header, 8-byte-aligned DATA/ENTRY
    objects with item lists (operators/journal.encode_journal,
    public systemd.io Journal File Format; the reference instead
    dlopens libsystemd, journalreader.rs:550) — written as two
    .journal files and decoded back through read_journal (binaryFile
    → sequential object walk in mapInPandas).  DATA objects are
    deduplicated by payload exactly like journald does, so the
    decode also proves item-offset resolution across shared DATA."""
    import os
    import tempfile

    from super_speedy_syslog_searcher_spark.operators.journal import (
        encode_journal,
        read_journal,
    )

    session.prep(spark)
    d = tempfile.mkdtemp(prefix="s4jrnl_")
    paths = _write_journal_fixtures(spark, sf_dir, d)
    out = read_journal(spark, paths)
    return out.select(
        F.regexp_extract(
            "source", r"(f\d)\.journal", 1
        ).alias("source_label"),
        F.col("rec_idx").cast("int").alias("rec_idx"),
        F.col("seqnum").cast("long").alias("seqnum"),
        "ts",
        F.col("monotonic_us").cast("long").alias("monotonic_us"),
        "message",
        "hostname",
        "identifier",
        F.col("pid").cast("int").alias("pid"),
    )


def q_dedup_exact(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.exact_dups(docs).select(
        "digest",
        F.col("canonical_doc_id").cast("bigint").alias("canonical_doc_id"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
    )


def q_prefix_join(spark, sf_dir):
    """Exact Jaccard >= 0.8 similarity join via prefix filtering
    (ppjoin-lite): candidates from prefix x posting joins only, exact
    doc-keyed verify; the oracle generates candidates INDEPENDENTLY
    (any shared shingle) — equality proves the pigeonhole
    completeness of the prefix filter."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.prefix_filter_pairs(docs)


def q_dedup_minhash_lsh(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_band_pairs(docs).select(
        F.col("doc_a").cast("bigint").alias("doc_a"),
        F.col("doc_b").cast("bigint").alias("doc_b"),
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.ngram_jaccard_pairs(docs).select(
        F.col("doc_a").cast("bigint").alias("doc_a"),
        F.col("doc_b").cast("bigint").alias("doc_b"),
        "jaccard",
    )


def q_dedup_lsh_verified(spark, sf_dir):
    """Scale path: LSH band candidates → exact Jaccard verify (no
    shingle×shingle join anywhere in the plan)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.lsh_verified_pairs(docs).select(
        F.col("doc_a").cast("bigint").alias("doc_a"),
        F.col("doc_b").cast("bigint").alias("doc_b"),
        "jaccard",
    )


def q_simhash(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "simhash_hex"
    )


def q_ann_cosine_topk(spark, sf_dir):
    session.prep(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.cosine_topk(emb).select(
        F.col("probe_id").cast("bigint").alias("probe_id"),
        F.col("nbr_id").cast("bigint").alias("nbr_id"),
        "cosine",
        "rank",
    )


def q_ann_ivf_topk(spark, sf_dir):
    session.prep(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.ivf_topk(emb).select(
        F.col("probe_id").cast("bigint").alias("probe_id"),
        F.col("nbr_id").cast("bigint").alias("nbr_id"),
        "cosine",
        "rank",
    )


def q_streaming_hourly(spark, sf_dir):
    """Structured Streaming per-(hour, sink) counts, drained with
    Trigger.AvailableNow through the watermarked windowed aggregate
    (streaming/pipeline.py) — the one queries() entry that exercises
    readStream end-to-end.  The oracle is the batch semantic: counts
    over the by-construction expected parses (uptime rows excluded —
    their timestamp exists only after the batch repair stage)."""
    import tempfile

    session.prep(spark)
    from super_speedy_syslog_searcher_spark.streaming import (
        pipeline as SP,
    )

    t = _t(spark, sf_dir)
    in_dir = tempfile.mkdtemp(prefix="s4stream_in_")
    t.write.mode("overwrite").parquet(in_dir)
    name = "s4_stream_hourly_q"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    SP.run_hourly_to_memory(spark, in_dir, name)
    return spark.table(name).select(
        "hour", "sink", F.col("rows").cast("bigint").alias("rows")
    )


def q_streaming_dedup(spark, sf_dir):
    """Streaming exactly-once repair of an at-least-once source under
    the driver oracle: the transcript files are written once, then a
    subset (turn_idx % 7 == 0) is re-delivered as extra files; the
    dropDuplicatesWithinWatermark stream collapses the redeliveries by
    text digest.  Output restricted to (digest, text) — identical
    across copies — so the result is arrival-order independent; the
    oracle is the batch DISTINCT."""
    import tempfile

    session.prep(spark)
    from super_speedy_syslog_searcher_spark.streaming import (
        pipeline as SP,
    )

    t = _t(spark, sf_dir)
    in_dir = tempfile.mkdtemp(prefix="s4stream_dedup_in_")
    t.write.mode("overwrite").parquet(in_dir)
    t.filter(F.col("turn_idx") % 7 == 0).write.mode("append").parquet(
        in_dir
    )
    name = "s4_stream_dedup_q"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    SP.run_dedup_to_memory(spark, in_dir, name)
    return spark.table(name).select("digest", "text")


def q_streaming_assembly(spark, sf_dir):
    """Stateful streaming sysline assembly under the driver oracle:
    readStream → parse → applyInPandasWithState continuation attach +
    uptime-anchor carry (streaming/stateful.py), drained with
    Trigger.AvailableNow to parquet, then compared row-for-row
    against the SAME assembly window the batch oracle uses: with the
    boot anchor carried in state (round-4), dmesg-uptime rows resolve
    to absolute time in the streaming path too, so streaming output
    now equals batch parse+repair(uptime)+assemble exactly."""
    import tempfile

    from super_speedy_syslog_searcher_spark.streaming.stateful import (
        run_assembled_available_now,
    )

    session.prep(spark)
    t = _t(spark, sf_dir)
    in_dir = tempfile.mkdtemp(prefix="s4sasm_in_")
    out_dir = tempfile.mkdtemp(prefix="s4sasm_out_")
    ck = tempfile.mkdtemp(prefix="s4sasm_ck_")
    t.write.mode("overwrite").parquet(in_dir)
    run_assembled_available_now(spark, in_dir, out_dir, ck)
    out = spark.read.parquet(out_dir)
    return out.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("msg_turn_idx").cast("int").alias("msg_turn_idx"),
        "ts_eff",
        "sink_eff",
    )


def q_streaming_scores(spark, sf_dir):
    """Stateful streaming rollout scoring (the RL / best-of-n feed
    shape): applyInPandasWithState carries each conversation's
    (prompt_key, cumulative reward, update seq) across micro-batches
    (streaming/stateful.py scored_stream), drained with
    Trigger.AvailableNow.  The final (max upd_seq) row per conv is
    arrival-order independent — the score is a sum and prompt_key
    latches when turn 0 arrives — so it equals the batch per-conv
    score table (operators/sft.py _conv_scores) exactly, and batch
    best_of_n is its argmax reduction.  Runs over the augmented
    rollout corpus so shared-prompt groups are real."""
    import tempfile

    from super_speedy_syslog_searcher_spark.streaming.stateful import (
        run_scored_available_now,
    )

    session.prep(spark)
    r = _rollouts(spark, sf_dir)
    in_dir = tempfile.mkdtemp(prefix="s4score_in_")
    out_dir = tempfile.mkdtemp(prefix="s4score_out_")
    ck = tempfile.mkdtemp(prefix="s4score_ck_")
    r.write.mode("overwrite").parquet(in_dir)
    run_scored_available_now(
        spark, in_dir, out_dir, ck, max_files_per_trigger=4
    )
    out = spark.read.parquet(out_dir)
    return out.groupBy("conv_id").agg(
        F.expr("max_by(prompt_key, upd_seq)").alias("prompt_key"),
        F.expr("max_by(score, upd_seq)").cast("bigint").alias("score"),
    )


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs.  The synthetic embeddings have
    no natural near-dups (max pairwise cosine ~0.44), so the query
    derives an augmented table with deterministic scaled copies
    (vec_id % 25 == 0 -> vec_id + 10000, embedding x 1.5 — identical
    direction, cosine 1.0) in BOTH engines, the same
    derive-the-fixture idiom as the transcripts corpus; the operator
    then finds the planted pairs via IVF-bucket candidates, never
    all-pairs."""
    session.prep(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT))"
        ).alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(copies)
    return similarity.embedding_near_dups(aug).select(
        F.col("vec_a").cast("bigint").alias("vec_a"),
        F.col("vec_b").cast("bigint").alias("vec_b"),
        "cosine",
    )


LEAK = " leak marker phrase alpha beta gamma delta epsilon"


def q_contamination(spark, sf_dir):
    """Benchmark decontamination under the driver oracle: documents
    split into a benchmark set (doc_id % 47 == 0) and a training set;
    a known leak phrase is planted in benchmark doc 0 and in training
    docs with doc_id % 31 == 1 (both engines derive it identically),
    then the 5-gram-overlap check flags every contaminated training
    doc.  The benchmark's distinct grams broadcast; corpus rows never
    shuffle."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plant = lambda cond: F.concat(  # noqa: E731
        F.col("text"), F.when(cond, F.lit(LEAK)).otherwise(F.lit(""))
    )
    bench = docs.filter(F.col("doc_id") % 47 == 0).select(
        "doc_id", plant(F.col("doc_id") == 0).alias("text")
    )
    train = docs.filter(F.col("doc_id") % 47 != 0).select(
        "doc_id", plant(F.col("doc_id") % 31 == 1).alias("text")
    )
    out = dedup.contamination_check(train, bench)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_overlaps").cast("int").alias("n_overlaps"),
        "example_gram",
    )


def q_pii_redact(spark, sf_dir):
    """PII scrubbing under the driver oracle.  The synthetic documents
    carry no planted PII, so both engines derive the same augmented
    text (appended email / IPv4 / 16-digit number keyed on doc_id) and
    redact it independently — Spark with Java-regex regexp_replace,
    the oracle with DuckDB's RE2 ('g' flag); the shared patterns avoid
    every dialect-divergent construct."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("int"),
            F.lit(".17 ref 4111111111111111"),
        ).alias("text"),
    )
    return textstats.redact_pii(aug).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "clean_text",
        "n_emails",
        "n_ips",
        "n_longnums",
    )


BLOCKED_DOMAINS = [
    "site0.example.org",
    "site5.example.org",
    "cdn3.example.net",
    "evil.example.com",  # in the blocklist, never cited — must not appear
]


def q_domain_profile(spark, sf_dir):
    """Per-domain URL profile under the driver oracle.  The synthetic
    documents carry no URLs, so both engines derive the same augmented
    text (every doc cites https://site{doc_id%13}.example.org; docs
    with doc_id % 4 == 1 also cite http://cdn{doc_id%7}.example.net),
    extract hosts with the shared RE2-safe pattern, and aggregate
    (n_urls, n_docs) per domain; a 4-entry blocklist marks blocked
    domains via broadcast join."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://site"),
            (F.col("doc_id") % 13).cast("int"),
            F.lit(".example.org/p"),
            F.col("doc_id"),
            F.when(
                F.col("doc_id") % 4 == 1,
                F.concat(
                    F.lit(" and http://cdn"),
                    (F.col("doc_id") % 7).cast("int"),
                    F.lit(".example.net/asset"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    bl = spark.createDataFrame(
        [(d,) for d in BLOCKED_DOMAINS], "domain string"
    )
    return textstats.domain_profile(aug, bl).select(
        "domain",
        "n_urls",
        "n_docs",
        F.col("blocked").cast("int").alias("blocked"),
    )


def q_winnow(spark, sf_dir):
    """Winnowing (MOSS) local fingerprints of every document — the
    guarantee-carrying selection (any shared ≥ w+k-1-token substring
    shares a fingerprint) computed by both engines through the same
    packed-integer min-per-window, no augmentation needed."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup.winnow_fingerprints(docs)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("fp_pos").cast("int").alias("fp_pos"),
        F.col("fp_hash").cast("bigint").alias("fp_hash"),
    )


def q_gopher_quality(spark, sf_dir):
    """Gopher rule-based quality filter (Rae et al. 2021): per-doc
    rule flags + combined keep decision, all thresholds evaluated by
    integer cross-multiplication (engine-portable, no floats)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.gopher_quality(docs)


def q_tfidf_topk(spark, sf_dir):
    """Top-5 tf-idf terms per document (linear idf N/df — mul/div
    only, engine-portable integer-scaled score)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.tfidf_topk(docs, k=5)


def q_kmeans_embed(spark, sf_dir):
    """Lloyd's k-means (k=8, 4 iterations) over the embedding table in
    fixed-point integer arithmetic — iterative yet hash-checkable: the
    DuckDB oracle replays the identical iterations as chained CTEs."""
    session.prep(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cluster.kmeans_embed(emb, k=8, n_iter=4)


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (target = lang 'en'): count-weighted
    integer sum of quantized unigram probability ratios."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.dsir_weights(docs)


def q_sft_pairs(spark, sf_dir):
    """SFT (prompt, response) extraction: each user turn paired with
    the first following assistant turn in-conversation, skipped when
    another user turn intervenes.  One conv_id-keyed window scan."""
    session.prep(spark)
    return sft.build_sft_pairs(transcripts_df(spark, sf_dir))


def q_conv_chunks(spark, sf_dir):
    """Sliding last-4-turn context windows at stride 2 per
    conversation (long-context curriculum chunking)."""
    session.prep(spark)
    return sft.conv_chunks(transcripts_df(spark, sf_dir), k=4, stride=2)


def _rollouts(spark, sf_dir):
    """Shared rollout augmentation for the rollout-tree / best-of-n /
    preference ops: every conv with cnum % 5 == 0 gains two extra
    rollouts ('#r1', '#r2') that share the first ceil(n/2) turns and
    diverge after (text suffixed ' (alt r)').  The DuckDB oracle
    derives the identical augmentation from the exp CTE."""
    t = transcripts_df(spark, sf_dir)
    aug = t.withColumn(
        "_half",
        F.expr("(count(*) OVER (PARTITION BY conv_id) + 1) DIV 2"),
    ).withColumn(
        "_cnum", F.substring("conv_id", 6, 10).cast("int")
    )
    # one explode instead of a 3-way self-union: the union form
    # evaluated the transcripts derivation once per arm (3x datagen
    # windows + 3x the 58-family text projection); same multiset
    # (_r = 0 is the base rollout, 1/2 the alts) — guide §1.2
    variants = F.when(
        F.col("_cnum") % 5 == 0, F.expr("array(0, 1, 2)")
    ).otherwise(F.expr("array(0)"))
    ex = aug.select("*", F.explode(variants).alias("_r"))
    return ex.select(
        F.when(F.col("_r") == 0, F.col("conv_id"))
        .otherwise(
            F.concat(
                "conv_id", F.lit("#r"), F.col("_r").cast("string")
            )
        )
        .alias("conv_id"),
        "turn_idx",
        "role",
        F.when(
            (F.col("_r") > 0) & (F.col("turn_idx") >= F.col("_half")),
            F.concat(
                F.col("text"),
                F.lit(" (alt "),
                F.col("_r").cast("string"),
                F.lit(")"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "tool",
        "ts",
    )


def q_rollout_tree(spark, sf_dir):
    """Rollout prefix-tree nodes over the augmented rollout corpus:
    per distinct conversation prefix, the number of rollouts passing
    through it and the number of distinct continuations — the dedup
    ledger for shared-prefix storage of RL / best-of-n samples."""
    session.prep(spark)
    return sft.rollout_tree(_rollouts(spark, sf_dir))


def q_best_of_n(spark, sf_dir):
    """Best-of-n selection: highest-scoring rollout per shared-prompt
    group (score = total assistant characters, deterministic
    tie-break)."""
    session.prep(spark)
    return sft.best_of_n(_rollouts(spark, sf_dir))


def q_preference_pairs(spark, sf_dir):
    """RLHF preference pairs: (chosen, rejected) = (argmax, argmin)
    rollout per shared-prompt group where the scores differ."""
    session.prep(spark)
    return sft.preference_pairs(_rollouts(spark, sf_dir))


def q_grpo_advantage(spark, sf_dir):
    """Group-relative advantages (GRPO/RLOO baseline): per rollout,
    its score centered on its shared-prompt group mean, integer
    permille via truncating division (identical in both engines)."""
    session.prep(spark)
    return sft.grpo_advantage(_rollouts(spark, sf_dir))


def _bt_scored(spark, sf_dir):
    """Per-(prompt, player) reward-model scores over the rollout
    corpus: player = the rollout variant tag ('base' / 'r1' / 'r2'
    from the conv_id suffix), score = the deterministic 52-bit hash of
    (prompt_key | player | rm1) standing in for a reward-model judge —
    identical by construction in both engines."""
    t = sft._conv_scores(_rollouts(spark, sf_dir))
    player = F.when(
        F.col("conv_id").contains("#"),
        F.substring_index("conv_id", "#", -1),
    ).otherwise(F.lit("base"))
    scored = t.select("prompt_key", player.alias("player"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("prompt_key"),
                    F.lit("|"),
                    F.col("player"),
                    F.lit("|rm1"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    return scored.withColumn("score", h)


def q_bt_ratings(spark, sf_dir):
    """Bradley-Terry strength fitting over pairwise rollout outcomes
    (fixed-point MM iterations, bit-identical to the DuckDB chained-
    CTE replay): the rating step of RLHF preference-data curation."""
    session.prep(spark)
    out = rank.pairwise_outcomes(_bt_scored(spark, sf_dir))
    return rank.bradley_terry(out, n_iter=6)


def q_loss_mask_spans(spark, sf_dir):
    """SFT loss-mask char spans: [start, end) offsets of every
    assistant turn's text within the 'role: text\\n'-rendered
    conversation — pure integer cumulative-window math."""
    session.prep(spark)
    return sft.loss_mask_spans(transcripts_df(spark, sf_dir))


def q_role_alternation(spark, sf_dir):
    """Per-conversation chat-format hygiene report: first/last role,
    adjacent same-role repeats, and the strict-dialogue verdict."""
    session.prep(spark)
    return sft.role_alternation(transcripts_df(spark, sf_dir))


def q_fim_split(spark, sf_dir):
    """Deterministic fill-in-the-middle transform (PSM mode): two
    hash-derived interior cuts per document, zero shuffle."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return transforms.fim_split(docs)


def q_token_budget_sample(spark, sf_dir):
    """Token-budget corpus assembly: per-source token quotas filled
    in deterministic hash order (whitespace tokens; budget map keyed
    on the synthetic sources)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budgets = {f"src{k}": 150 * (k + 1) for k in range(0, 20, 2)}
    return sketch.token_budget_sample(docs, budgets)


def q_pack_sft(spark, sf_dir):
    """SFT packing with loss masks: whole conversations packed into
    2000-char sequences (two-level distributed prefix sum, no global
    window), assistant spans re-based to their pack."""
    session.prep(spark)
    return sft.pack_sft(transcripts_df(spark, sf_dir), capacity=2000)


def q_dedup_survivors(spark, sf_dir):
    """Near-dup survivor selection: connected components over the
    LSH-verified pairs, then keep the highest-quality doc per cluster
    (tie-break smallest doc_id) — the step that turns pair detection
    into an actual deduplicated corpus keyed on quality, not on
    arbitrary min-id."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cc = dedup.duplicate_clusters(dedup.lsh_verified_pairs(docs))
    qual = textstats.quality_scores(docs).select("doc_id", "quality_x10k")
    w = W.partitionBy("cluster_id").orderBy(
        F.col("quality_x10k").desc(), "doc_id"
    )
    return (
        cc.join(qual, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            "quality_x10k",
            (F.col("rk") == 1).cast("int").alias("is_survivor"),
        )
    )


def q_curriculum_bins(spark, sf_dir):
    """Exact quality-decile curriculum bins: order-statistic
    thresholds from the frequency table, applied as a narrow literal
    comparison map (no global window)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qual = textstats.quality_scores(docs).select("doc_id", "quality_x10k")
    return sketch.curriculum_bins(qual)


def _synth_lines(spark, sf_dir):
    """Shared multi-line corpus for the line-level ops: the same
    deterministic derivation (lines.synth_lines_sql) runs on Spark
    here and inside the DuckDB oracle, so both engines see identical
    (doc_id, line_pos, line) inputs."""
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents_l")
    return spark.sql(lines.synth_lines_sql("spark", "documents_l"))


def q_c4_filter(spark, sf_dir):
    """C4 (Raffel et al. 2020) line+document rule cleaning: per-line
    terminal-punctuation / >=5-words / no-javascript rules, per-doc
    curly-brace / lorem-ipsum / >=3-surviving-lines rules, rebuilt
    clean text.  One doc_id hash aggregate, no join or window."""
    session.prep(spark)
    return lines.c4_line_filter(_synth_lines(spark, sf_dir))


def q_line_dedup(spark, sf_dir):
    """CCNet corpus-wide duplicated-line removal: each line's first
    occurrence (min (doc_id, line_pos)) survives, every other copy is
    excised — boilerplate banners vanish.  First-occurrence table via
    map-side-combinable groupBy (hot banner keys collapse per map
    task), then one line-keyed join back and one doc aggregate."""
    session.prep(spark)
    return lines.line_dedup(_synth_lines(spark, sf_dir))


def q_bpe_pairs(spark, sf_dir):
    """Weighted adjacent character-pair counts over the corpus — the
    statistic the first BPE merge maximizes; the explode runs on the
    distinct-token table, never the corpus."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe.pair_counts(docs).select(
        "pair", F.col("n").cast("bigint").alias("n")
    )


def q_bpe_train(spark, sf_dir):
    """Deterministic BPE merge training (8 merges) — genuinely
    iterative (each merge depends on the table the previous one
    rewrote), so there is no single-statement SQL oracle; the driver
    records the rows-only check and pytest pins equivalence against a
    naive single-machine trainer on randomized corpora."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe.train_bpe(docs, n_merges=8).select(
        F.col("rank").cast("int").alias("rank"),
        "left",
        "right",
        F.col("n").cast("bigint").alias("n"),
    )


BOILER1 = (
    "this message was generated by the automated export pipeline"
    " and must be ignored by the training run"
)
BOILER2 = "copyright notice all rights reserved worldwide second edition printing"


def q_dup_spans(spark, sf_dir):
    """Exact-substring (duplicate k-token-gram span) removal under the
    driver oracle.  Two boilerplate sentences are planted
    deterministically (doc_id % 5 == 2 gets a 17-token export notice,
    doc_id % 11 == 7 a 9-token copyright line; docs ≡ 7 mod 55 get
    both), so corpus-wide duplicate 8-grams exist by construction in
    both engines; duplicate_spans marks every covered token, merges
    islands into spans, and rebuilds the excised text."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 2, F.lit(" " + BOILER1)).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 11 == 7, F.lit(" " + BOILER2)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    out = dedup.duplicate_spans(aug)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        "n_dup_tokens",
        "dup_permille",
        "n_spans",
        "clean_text",
    )


def q_dedup_incremental(spark, sf_dir):
    """Snapshot-increment dedup under the driver oracle.  The corpus
    splits into base (doc_id % 3 != 0) and incoming (doc_id % 3 == 0);
    incoming docs ≡ 0 mod 30 take the text of base doc (id+1) — exact
    copies — and docs ≡ 15 mod 30 take base doc (id+2)'s text plus one
    appended token — near-dup candidates.  Both engines derive the
    planted texts and the digest/band classification identically."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    n1 = docs.select(
        (F.col("doc_id") - 1).alias("k1"), F.col("text").alias("t1")
    )
    n2 = docs.select(
        (F.col("doc_id") - 2).alias("k2"), F.col("text").alias("t2")
    )
    inc = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .join(n1, F.col("doc_id") == F.col("k1"), "left")
        .join(n2, F.col("doc_id") == F.col("k2"), "left")
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 30 == 0, F.coalesce("t1", "text"))
            .when(
                F.col("doc_id") % 30 == 15,
                F.coalesce(
                    F.concat(F.col("t2"), F.lit(" zzextra")), F.col("text")
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    out = dedup.incremental_dedup(inc, base)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "status",
        F.col("base_doc_id").cast("bigint").alias("base_doc_id"),
        "n_band_hits",
    )


def q_pack_sequences(spark, sf_dir):
    """Concatenate-and-chunk sequence packing (GPT-pretraining shape)
    — the BUCKETED two-level-scan variant (per-bucket running-sum
    windows + broadcast base offsets; the only SinglePartition
    exchange is the n_buckets-row subtotal frame), proven
    output-identical to the global-window form; bounded explode onto
    overlapped packs, pack_id shuffle; DuckDB oracle reproduces with
    one global window (its own engine's choice)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = textstats.pack_sequences_bucketed(docs)
    return out.select(
        F.col("pack_id").cast("bigint").alias("pack_id"),
        F.col("n_docs").cast("int").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("first_doc").cast("bigint").alias("first_doc"),
        F.col("last_doc").cast("bigint").alias("last_doc"),
    )


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup-style semantic dedup over the augmented embeddings
    (planted 1.5x-scaled copies, same derivation as dedup_embedding):
    nearest-cell assignment, lowest-vec_id representative per cell,
    drop members above the cosine-to-representative threshold."""
    session.prep(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT))"
        ).alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(copies)
    out = similarity.semantic_dedup(aug)
    return out.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "cell",
        "rep_id",
        "cos_to_rep",
        "keep",
    )


def q_text_tokens(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.token_counts(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "ws_tokens",
        "re_tokens",
        "n_chars",
    )


def q_text_quality(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.quality_scores(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_words",
        "stop_ratio",
        "punct_ratio",
        "mean_word_len",
        "quality_x10k",
    )


def q_lang_id(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.lang_id(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang_declared",
        "en_density",
        "lang_guess",
    )


def q_doc_fingerprint(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.fingerprints(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "content_fp",
        "bow_fp",
    )


def q_multimodal_frames(spark, sf_dir):
    """Frame-sampling over the binary payload (mapInPandas; the
    video/audio frame-sample plumbing with a deterministic fake
    decode)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.frame_samples(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_frames").cast("int").alias("n_frames"),
        "frames",
    )


def q_multimodal_meta(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.extract_metadata(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "header_hex",
        "modality",
    )


def q_distinct_kmv(spark, sf_dir):
    """Deterministic K-minimum-values distinct estimate of the corpus
    vocabulary (engine-portable alternative to HLL++; the DuckDB
    oracle reproduces the estimate bit-for-bit)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    )
    return sketch.kmv_distinct(toks, "tok", k=256)


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-Min sketch heavy hitters over the corpus vocabulary:
    every token whose CM estimate (min over d=4 salted-hash cells of
    w=1024 counters) reaches total/500, with the exact count
    alongside — est >= cnt always (the CM no-false-negative
    guarantee that makes the constant-size sketch a scan pre-filter
    at 100 TB).  One corpus groupBy; everything after runs on the
    vocabulary / the d*w-row sketch (broadcast)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.cms_heavy_hitters(docs, d=4, w=1024, denom=500)


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct estimates in pure integer math (52-bit
    md5 hash, integer-numerator harmonic sum, ppm-fixed-point alpha,
    precomputed linear-counting literals) — bit-identical in both
    engines, unlike approx_count_distinct's JVM-internal HLL++.
    Two regimes in one result: the tiny document vocabulary (linear
    counting) and the near-unique transcript texts (raw HLL)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    )
    t = _t(spark, sf_dir)
    d1 = sketch.hll_distinct(toks, "tok").withColumn(
        "src", F.lit("doc_tokens")
    )
    d2 = sketch.hll_distinct(t.select("text"), "text").withColumn(
        "src", F.lit("turn_texts")
    )
    return d1.unionByName(d2).select(
        "src", "m", "n_buckets_used", "s_int", "est_raw", "est_distinct"
    )


def q_streaming_sessions(spark, sf_dir):
    """Stateful streaming sessionization: gap-based session labels
    assigned on a live event feed via applyInPandasWithState (state =
    last event time + session index per user), drained with
    Trigger.AvailableNow, then aggregated to per-session stats — the
    result equals batch sessionize exactly (same oracle).  The feed
    files are user-partitioned (whole-user files), the cluster-scale
    layout for per-key streaming state."""
    import tempfile

    from super_speedy_syslog_searcher_spark.streaming.stateful import (
        run_sessions_available_now,
    )

    session.prep(spark)
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("event_id", "user_id", "ts", "event_type", "value",
                "props")
    )
    in_dir = tempfile.mkdtemp(prefix="s4sess_in_")
    out_dir = tempfile.mkdtemp(prefix="s4sess_out_")
    ck = tempfile.mkdtemp(prefix="s4sess_ck_")
    ev.repartition(8, "user_id").write.mode("overwrite").parquet(in_dir)
    run_sessions_available_now(
        spark, in_dir, out_dir, ck, max_files_per_trigger=2
    )
    out = spark.read.parquet(out_dir)
    return out.groupBy("session_id", "user_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("bigint").alias("n_events"),
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts))) DIV 1000000"
        ).cast("bigint").alias("duration_s"),
    ).select(
        "session_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        "session_start",
        "session_end",
        "n_events",
        "duration_s",
    )


def q_bloom_prefilter(spark, sf_dir):
    """Bloom-filter pre-join membership filter: the key set (every
    10th document's text) is summarized as <= 512 set-bit positions
    (broadcast), candidates pass iff all 4 salted-hash positions are
    set.  No false negatives ever (bloom_pass ⊇ exact, test-pinned);
    false positives surfaced per row — the deterministic, oracle-
    checkable form of Spark's runtime bloom-filter pushdown."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keys = docs.filter(F.col("doc_id") % 10 == 0).select("text")
    return sketch.bloom_prefilter(docs, keys, mbits=512, k=4)


def q_rate_anomalies(spark, sf_dir):
    """Per-sink hourly rate anomalies over the routed pipeline
    output: hours whose row count exceeds 3× the sink's exact median
    hourly count, flagged with integer cross-multiplication (no
    float percentile)."""
    session.prep(spark)
    return stats.rate_anomalies(
        P.assembled(_t(spark, sf_dir), narrow=True)
    )


def q_zorder_key(spark, sf_dir):
    """Z-order (Morton) layout keys over (turn_idx, conv-number):
    the multi-dim clustering key for OPTIMIZE ZORDER-style layout
    rewrites, pure integer bit interleave + top-bit bucket."""
    from super_speedy_syslog_searcher_spark.operators import layout

    session.prep(spark)
    t = _t(spark, sf_dir)
    d = t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        (
            F.substring("conv_id", 6, 10).cast("long") % 65536
        ).alias("_y"),
    )
    return layout.zorder_key(d, "turn_idx", "_y", bits=16,
                             n_buckets=64).select(
        "conv_id", "turn_idx", "zkey", "zbucket"
    )


def q_inverted_index(spark, sf_dir):
    """Corpus inverted index: per token, document frequency plus the
    rendered (doc:pos) posting list in (doc_id, pos) order; tokens
    above the df cap keep df but elide postings (the stopword rule —
    and the posting-list skew guard)."""
    from super_speedy_syslog_searcher_spark.operators import textstats

    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.inverted_index(docs, df_cap=64)


def q_response_latency(spark, sf_dir):
    """Reply-latency distribution over (user -> assistant) pairs:
    exact integer p50/p90/p99 of whole-second latencies — the SLA
    profile of an agent-transcript corpus."""
    session.prep(spark)
    out = sft.response_latency(transcripts_df(spark, sf_dir))
    return out.select(
        F.col("q_permille").cast("int").alias("q_permille"),
        F.col("k").cast("bigint").alias("k"),
        F.col("value").cast("bigint").alias("value"),
    )


def q_hourly_uniques(spark, sf_dir):
    """Unique users per hour: exact count(DISTINCT) beside the
    per-group HLL estimate (one sketch per hour, 2^8 registers each)
    — the grouped-distinct shape where the sketch replaces the
    row-wide distinct shuffle at 10^12 rows."""
    session.prep(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.hourly_uniques(ev, p=8)


def q_corpus_diff(spark, sf_dir):
    """Snapshot-diff CDC classification between two corpus versions
    derived identically in both engines: every 13th doc removed,
    every 7th changed (' v2' suffix), every 11th re-added under a new
    id.  One id-keyed digest join; no text moves."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    changed = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" v2")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.lit("new doc "), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    new = changed.unionByName(added)
    return transforms.corpus_diff(docs, new)


def q_snapshot_apply(spark, sf_dir):
    """MERGE INTO (the CDC write side): apply the q_corpus_diff
    increment — %7 updates, %11 inserts under new ids, %13 delete
    tombstones — to the base snapshot; the oracle derives the target
    snapshot directly, so hash equality proves the round-trip law
    (diff -> apply == new)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    deletes = docs.filter(F.col("doc_id") % 13 == 0).select("doc_id")
    updates = docs.filter(
        (F.col("doc_id") % 13 != 0) & (F.col("doc_id") % 7 == 0)
    ).select(
        "doc_id", F.concat(F.col("text"), F.lit(" v2")).alias("text")
    )
    inserts = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.lit("new doc "), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    return transforms.snapshot_apply(
        docs, updates.unionByName(inserts), deletes
    )


def q_json_props(spark, sf_dir):
    """Schema-on-read JSON payload extraction over events.props
    (JVM-side get_json_object, whole-stage codegen) aggregated per
    event_type."""
    session.prep(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return transforms.json_props_stats(ev)


def q_streaming_hll(spark, sf_dir):
    """HLL registers maintained over a live stream (complete-mode
    groupBy(bucket) max aggregate — state bounded at 2^p rows at any
    stream volume), drained with Trigger.AvailableNow; equals the
    batch register sketch over the same corpus exactly (max is order-
    and redelivery-insensitive, exercised with a redelivered file
    subset)."""
    import tempfile

    from super_speedy_syslog_searcher_spark.streaming import (
        pipeline as SP,
    )

    session.prep(spark)
    t = _t(spark, sf_dir)
    in_dir = tempfile.mkdtemp(prefix="s4hll_in_")
    t.write.mode("overwrite").parquet(in_dir)
    t.filter(F.col("turn_idx") % 5 == 0).write.mode("append").parquet(
        in_dir
    )
    name = "s4_stream_hll_q"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    SP.run_hll_to_memory(spark, in_dir, name, col="text")
    return spark.table(name).select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("maxrho").cast("int").alias("maxrho"),
    )


def q_streaming_cms(spark, sf_dir):
    """Count-Min sketch cells maintained over a live stream
    (complete-mode groupBy(j, cell) count — state bounded at d*w rows
    at any volume), drained with Trigger.AvailableNow; equals the
    batch cms_cells over the same corpus (exactly-once source)."""
    import tempfile

    from super_speedy_syslog_searcher_spark.streaming import (
        pipeline as SP,
    )

    session.prep(spark)
    t = _t(spark, sf_dir)
    in_dir = tempfile.mkdtemp(prefix="s4cms_in_")
    t.write.mode("overwrite").parquet(in_dir)
    name = "s4_stream_cms_q"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    SP.run_cms_to_memory(spark, in_dir, name, col="text")
    return spark.table(name).select(
        F.col("j").cast("int").alias("j"),
        F.col("cell").cast("int").alias("cell"),
        F.col("c").cast("bigint").alias("c"),
    )


def q_length_quantiles(spark, sf_dir):
    """Exact integer order-statistic quantiles of document length
    (p50/p90/p99 of n_chars in permille ranks) — pure integer math on
    the distinct-length frequency table, so both engines select the
    identical threshold values."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sketch.int_quantiles(docs, "n_chars")
    return out.select(
        "q_permille",
        F.col("k").cast("bigint").alias("k"),
        F.col("value").cast("int").alias("value"),
    )


def q_stratified_sample(spark, sf_dir):
    """Deterministic 10% hash-bucket sample of documents, tallied per
    stratum — the reproducible train/val-split shape (pure narrow
    filter, zero shuffle before the tally)."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = sketch.stratified_sample(docs, "doc_id", pct=10)
    return s.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("rows"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
    )


def q_temperature_mix(spark, sf_dir):
    """Temperature-based (alpha = 1/2) mixture sampling: each source
    contributes budget * sqrt(n_s)/sum sqrt docs, picked in
    deterministic hash order; isqrt is exact integer in both engines."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.temperature_mix(docs, budget=200)


def q_rollout_diversity(spark, sf_dir):
    """Distinct-bigram diversity per shared-prompt rollout group —
    the mode-collapse metric of best-of-n sampling, integer permille."""
    session.prep(spark)
    return sft.rollout_diversity(_rollouts(spark, sf_dir))


def q_repeat_collapse(spark, sf_dir):
    """Syslog duplicate suppression: consecutive identical lines per
    conversation collapse to (first_turn, last_turn, n_repeats) —
    runs planted deterministically (system turns of every third conv
    tripled) identically in both engines."""
    t = _t(spark, sf_dir)
    cnum = F.substring("conv_id", 6, 10).cast("int")
    reps = F.when(
        ((cnum % 3) == 0) & (F.col("role") == "system"),
        F.expr("array(0, 1, 2)"),
    ).otherwise(F.expr("array(0)"))
    aug = t.withColumn("_r", F.explode(reps)).select(
        "conv_id",
        (F.col("turn_idx") * 4 + F.col("_r")).cast("int").alias(
            "turn_idx"
        ),
        "text",
    )
    return stats.repeat_collapse(aug)


def q_log_templates(spark, sf_dir):
    """Log-template mining: digit runs masked to '<n>', templates
    tallied, top-50 via TakeOrdered with deterministic tie-breaks."""
    return stats.log_templates(_t(spark, sf_dir), topn=50)


def q_length_histogram(spark, sf_dir):
    """Mergeable power-of-two histogram of document lengths: bucket =
    floor(log2(n_chars)) exactly via binary-string length (no float
    log); at most 64 rows at any corpus size."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.log2_histogram(docs, "n_chars")


def q_hourly_forecast(spark, sf_dir):
    """Seasonal-naive volume forecast per (event_type, hour):
    prediction = actual 24 h earlier, absolute error alongside — the
    capacity-planning baseline; the self-join runs on the hourly
    aggregate, never on events."""
    session.prep(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.hourly_forecast(ev)


def q_retention(spark, sf_dir):
    """Retention-cohort matrix over the events stream: users bucketed
    by first-event date, counted per later active-day offset — two
    map-side aggs + one user-keyed join, no count(DISTINCT) re-shuffle."""
    session.prep(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.retention_cohorts(ev)


def q_funnel(spark, sf_dir):
    """Strict sequential funnel signup → view → click → purchase:
    first qualifying event per step, each step strictly after the
    previous one's timestamp; k user-keyed agg+join rounds, no
    per-user array collection."""
    session.prep(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.funnel_conversion(ev)


def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN: fixed-point subspace k-means
    codebooks (4 x 16), byte codes per vector, ADC top-10 for a
    deterministic probe — with the true distance alongside so the
    quantization error is auditable.  Bit-identical to the DuckDB
    chained-CTE replay."""
    session.prep(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pq.pq_topk(emb)


def q_ivf_pq(spark, sf_dir):
    """IVF-PQ ANN (the FAISS IVFx,PQy production shape): coarse cell
    pruning to the probe's 3 nearest cells, PQ ADC only within them;
    true distance audited per row.  Bit-identical DuckDB replay."""
    session.prep(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pq.ivf_pq_topk(emb)


def q_tool_pagerank(spark, sf_dir):
    """Integer PageRank over the tool-transition graph of the
    transcripts (which tool tends to follow which): fixed-point
    iterations bit-identical to the DuckDB chained-CTE replay; the
    rank table stays distributed through every iteration."""
    edges = graph.tool_edges(_t(spark, sf_dir))
    return graph.pagerank(edges, n_iter=3)


def q_tool_triangles(spark, sf_dir):
    """Per-node triangle counts on the tool-transition graph via
    degree orientation (out-degree bounded wedge join); the oracle
    counts triangles independently with a direct a < b < c triple
    join — two different algorithms agreeing bit-for-bit."""
    edges = graph.tool_edges(_t(spark, sf_dir))
    return graph.triangle_counts(edges)


def q_group_split(spark, sf_dir):
    """Leakage-safe train/val/test split: the split key is the hash of
    the SOURCE (group), not the doc, so near-duplicate pages of one
    site can never straddle train and test.  Pure narrow map."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.group_split(docs, "source", "doc_id", seed="split1")


# ------------------------------------------------ general OLAP (TPC-H-ish)

def q_tpch_q1(spark, sf_dir):
    session.prep(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


def q_tpch_q3(spark, sf_dir):
    session.prep(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
            "o_orderdate",
            "o_orderpriority",
            "revenue",
        )
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: parse → repair →
    assemble → dt-filter → globally ordered merge."""
    return q_merge_ordered(spark, "/root/testdata/sf0.001")


def q_dedup_clusters(spark, sf_dir):
    """Connected-components clustering of the LSH-verified duplicate
    pairs: Spark runs min-label propagation with pointer jumping
    (operators/dedup.duplicate_clusters); the oracle computes the same
    closure with a recursive CTE — two independent CC algorithms."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.lsh_verified_pairs(docs)
    cc = dedup.duplicate_clusters(pairs)
    sz = cc.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return cc.join(sz, "cluster_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def q_sessionize(spark, sf_dir):
    session.prep(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return temporal.session_stats(ev).select(
        "session_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        "session_start",
        "session_end",
        "n_events",
        "duration_s",
    )


def q_asof_join(spark, sf_dir):
    session.prep(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return temporal.asof_attach(ev).select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        "ts",
        "event_type",
        "value",
        "asof_value",
        "asof_ts",
        "asof_lag_s",
    )


def q_asof_tables(spark, sf_dir):
    """Two-table as-of join: 'view' events attach the latest
    same-or-earlier 'purchase' per user.  Spark runs the tagged-union
    window composition (no inequality join); the oracle is DuckDB's
    NATIVE ASOF JOIN operator — an entirely independent algorithm.
    The right side is pre-aggregated to unique (user_id, ts) with
    max_by so the as-of target is deterministic in both engines."""
    session.prep(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    left = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    out = temporal.asof_join_tables(left, right, right_cols=("value",))
    return out.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        "ts",
        "asof_value",
        "asof_ts",
    )


def q_repetition_metrics(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.repetition_metrics(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        "top_tok_permille",
        "dup_bigram_permille",
        "is_repetitive",
    )


def q_mixture_sample(spark, sf_dir):
    """Weighted data-mixing sample: per-source keep rates (permille)
    derived from the source suffix so the same map works at every SF;
    src0 carries rate 0 and must vanish from the output."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = {f"src{i}": 50 * (i % 20) for i in range(20)}
    return (
        sketch.mixture_sample(docs, rates)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
    )


def q_unigram_logprob(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.unigram_logprob(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        "nll_micro_sum",
        "nll_per_tok_micro",
    )


def q_bigram_logprob(spark, sf_dir):
    """Self-trained bigram-LM NLL scoring (conditional MLE, integer
    micro-nat floor per distinct bigram before the per-doc sum — the
    unigram_logprob determinism recipe one order up).  Docs with a
    single token have no bigram and produce no row, identically in
    both engines."""
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.bigram_logprob(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_bigrams",
        "nll_micro_sum",
        "nll_per_bigram_micro",
    )


def q_vocab_topk(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.vocab_topk(docs).select(
        "rank", "tok", "count", "cum_permille"
    )


def q_shard_assign(spark, sf_dir):
    session.prep(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.shard_assign(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("shard").cast("int").alias("shard"),
        "pos",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "parse_extract": q_parse_extract,
        "merge_ordered": q_merge_ordered,
        "logfile_merge": q_logfile_merge,
        "fixedstruct_records": q_fixedstruct_records,
        "evtx_records": q_evtx_records,
        "odl_records": q_odl_records,
        "asl_records": q_asl_records,
        "etl_records": q_etl_records,
        "streaming_evtx": q_streaming_evtx,
        "streaming_journal": q_streaming_journal,
        "journal_records": q_journal_records,
        "union_merge": q_union_merge,
        "pattern_counts": q_pattern_counts,
        "sink_counts": q_sink_counts,
        "hourly_hist": q_hourly_hist,
        "streaming_hourly": q_streaming_hourly,
        "streaming_dedup": q_streaming_dedup,
        "streaming_assembly": q_streaming_assembly,
        "streaming_scores": q_streaming_scores,
        "conv_summary": q_conv_summary,
        "routed_enriched": q_routed_enriched,
        "global_summary": q_global_summary,
        "sysline_assembly": q_sysline_assembly,
        "dt_window_sinks": q_dt_window_sinks,
        "conv_dominant_pattern": q_conv_dominant_pattern,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "prefix_join": q_prefix_join,
        "dedup_lsh_verified": q_dedup_lsh_verified,
        "dedup_clusters": q_dedup_clusters,
        "simhash": q_simhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "dedup_embedding": q_dedup_embedding,
        "contamination": q_contamination,
        "pii_redact": q_pii_redact,
        "domain_profile": q_domain_profile,
        "winnow": q_winnow,
        "pack_sequences": q_pack_sequences,
        "dup_spans": q_dup_spans,
        "dedup_incremental": q_dedup_incremental,
        "dedup_semantic": q_dedup_semantic,
        "text_tokens": q_text_tokens,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_frames": q_multimodal_frames,
        "distinct_kmv": q_distinct_kmv,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "hll_distinct": q_hll_distinct,
        "streaming_sessions": q_streaming_sessions,
        "bloom_prefilter": q_bloom_prefilter,
        "rate_anomalies": q_rate_anomalies,
        "zorder_key": q_zorder_key,
        "inverted_index": q_inverted_index,
        "corpus_diff": q_corpus_diff,
        "snapshot_apply": q_snapshot_apply,
        "json_props": q_json_props,
        "streaming_hll": q_streaming_hll,
        "response_latency": q_response_latency,
        "hourly_uniques": q_hourly_uniques,
        "length_quantiles": q_length_quantiles,
        "stratified_sample": q_stratified_sample,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "asof_tables": q_asof_tables,
        "repetition_metrics": q_repetition_metrics,
        "shard_assign": q_shard_assign,
        "mixture_sample": q_mixture_sample,
        "unigram_logprob": q_unigram_logprob,
        "bigram_logprob": q_bigram_logprob,
        "vocab_topk": q_vocab_topk,
        "bpe_pairs": q_bpe_pairs,
        "gopher_quality": q_gopher_quality,
        "tfidf_topk": q_tfidf_topk,
        "kmeans_embed": q_kmeans_embed,
        "dsir_weights": q_dsir_weights,
        "sft_pairs": q_sft_pairs,
        "conv_chunks": q_conv_chunks,
        "rollout_tree": q_rollout_tree,
        "best_of_n": q_best_of_n,
        "preference_pairs": q_preference_pairs,
        "grpo_advantage": q_grpo_advantage,
        "bt_ratings": q_bt_ratings,
        "tool_pagerank": q_tool_pagerank,
        "tool_triangles": q_tool_triangles,
        "group_split": q_group_split,
        "pq_topk": q_pq_topk,
        "retention": q_retention,
        "funnel": q_funnel,
        "length_histogram": q_length_histogram,
        "hourly_forecast": q_hourly_forecast,
        "repeat_collapse": q_repeat_collapse,
        "log_templates": q_log_templates,
        "temperature_mix": q_temperature_mix,
        "rollout_diversity": q_rollout_diversity,
        "ivf_pq": q_ivf_pq,
        "streaming_cms": q_streaming_cms,
        "pack_sft": q_pack_sft,
        "loss_mask_spans": q_loss_mask_spans,
        "role_alternation": q_role_alternation,
        "fim_split": q_fim_split,
        "token_budget_sample": q_token_budget_sample,
        "dedup_survivors": q_dedup_survivors,
        "curriculum_bins": q_curriculum_bins,
        "c4_filter": q_c4_filter,
        "line_dedup": q_line_dedup,
        "bpe_train": q_bpe_train,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
    }


# ---------------------------------------------------------------- oracle

def oracle_sql() -> dict[str, str]:
    b = O.base()
    w = O.with_dims()
    rng = (
        f"ts_eff >= TIMESTAMP '{DT_AFTER}' "
        f"AND ts_eff <= TIMESTAMP '{DT_BEFORE}'"
    )
    return {
        "parse_extract": f"""{b}
SELECT conv_id, turn_idx, _ts_parsed AS ts_parsed, _pattern_id AS pattern_id,
       _sink AS sink, _dt_beg AS dt_beg, _dt_end AS dt_end
FROM exp""",
        "merge_ordered": f"""{b}
SELECT CAST(row_number() OVER (ORDER BY ts_eff, conv_id, turn_idx) AS BIGINT) AS msg_seq,
       conv_id, turn_idx, role, tool, text, ts_eff
FROM asm WHERE {rng}""",
        "union_merge": f"""{b},
u AS (
  SELECT conv_id, turn_idx, ts_eff FROM asm
  UNION ALL
  SELECT 'alt-' || conv_id, turn_idx, ts_eff FROM asm
)
SELECT CAST(row_number() OVER (ORDER BY ts_eff, conv_id, turn_idx) AS BIGINT) AS msg_seq,
       conv_id, turn_idx, ts_eff
FROM u WHERE {rng}""",
        "logfile_merge": f"""{b}
SELECT 'f' || CAST(CAST(substr(conv_id, 6, 5) AS INT) % 3 AS VARCHAR) AS file_label,
       _sink AS sink,
       CAST(count(*) AS BIGINT) AS rows,
       CAST(sum(CASE WHEN _pattern_id IS NOT NULL
                      AND _sink <> 'dmesg_uptime' THEN 1 ELSE 0 END)
            AS BIGINT) AS ts_rows
FROM exp GROUP BY 1, 2""",
        "fixedstruct_records": """WITH b AS (
  SELECT event_id AS e, user_id AS u,
         epoch_us(CAST(ts AS TIMESTAMP)) AS eus
  FROM events)
SELECT 'f' || CAST(CAST(e % 2 AS INT) AS VARCHAR) AS source_label,
       CAST(row_number() OVER (PARTITION BY e % 2 ORDER BY e) - 1 AS INT) AS rec_idx,
       CAST(CASE WHEN e % 4 = 0 THEN 8 ELSE 7 END AS INT) AS ut_type,
       CAST(e AS INT) AS ut_pid,
       'pts/' || CAST(e % 16 AS VARCHAR) AS ut_line,
       'user' || CAST(u % 10 AS VARCHAR) AS ut_user,
       'host-' || CAST(u % 10 AS VARCHAR) AS ut_host,
       make_timestamp(eus) AS ts
FROM b""",
        "etl_records": """WITH b AS (
  SELECT event_id AS e, user_id AS u,
         epoch_us(CAST(ts AS TIMESTAMP)) AS eus
  FROM events)
SELECT 'f' || CAST(CAST(e % 2 AS INT) AS VARCHAR) AS source_label,
       CAST(row_number() OVER (PARTITION BY e % 2 ORDER BY e) - 1
            AS INT) AS rec_idx,
       make_timestamp(eus) AS ts,
       'EventHeader' AS kind,
       '00000000-0000-4000-8000-' || lpad(CAST(u % 1000 AS VARCHAR), 12, '0')
         AS provider_id,
       CAST(100 + u % 50 AS INT) AS thread_id,
       CAST(4000 + e % 2 AS INT) AS process_id,
       CAST(e % 50 AS INT) AS payload_len
FROM b""",
        "asl_records": """WITH b AS (
  SELECT event_id AS e, user_id AS u,
         epoch_us(CAST(ts AS TIMESTAMP)) AS eus
  FROM events)
SELECT 'f' || CAST(CAST(e % 2 AS INT) AS VARCHAR) AS source_label,
       CAST(row_number() OVER (PARTITION BY e % 2 ORDER BY e) - 1
            AS INT) AS rec_idx,
       CAST(e + 1 AS BIGINT) AS rid,
       make_timestamp(eus) AS ts,
       CAST(e % 8 AS INT) AS level,
       CASE e % 8 WHEN 0 THEN 'Emergency' WHEN 1 THEN 'Alert'
                  WHEN 2 THEN 'Critical' WHEN 3 THEN 'Error'
                  WHEN 4 THEN 'Warning' WHEN 5 THEN 'Notice'
                  WHEN 6 THEN 'Info' ELSE 'Debug' END AS level_name,
       CAST(100 + u % 50 AS INT) AS pid,
       CAST(u % 3 AS INT) AS uid,
       CAST(CASE WHEN e % 2 = 0 THEN 4294967295 ELSE u % 100 END
            AS BIGINT) AS read_uid,
       'host' || CAST(u % 5 AS VARCHAR) AS host,
       'daemon' || CAST(e % 3 AS VARCHAR) AS sender,
       'com.example.fac' || CAST(e % 4 AS VARCHAR) AS facility,
       'asl event ' || CAST(e AS VARCHAR) || ' fired' AS message,
       'Key.One=val' || CAST(e % 9 AS VARCHAR) || '  K2=w'
         || CAST(u % 7 AS VARCHAR) AS extras
FROM b""",
        "odl_records": """WITH b AS (
  SELECT event_id AS e, user_id AS u,
         epoch_us(CAST(ts AS TIMESTAMP)) AS eus
  FROM events)
SELECT 'f' || CAST(CAST(e % 2 AS INT) AS VARCHAR) AS source_label,
       CAST(row_number() OVER (PARTITION BY e % 2 ORDER BY e) - 1
            AS INT) AS rec_idx,
       make_timestamp((eus // 1000) * 1000) AS ts,
       CAST(4000 + e % 2 AS INT) AS pid,
       CAST(100 + u % 50 AS INT) AS tid,
       'Module' || CAST(e % 7 AS VARCHAR) || '.cpp' AS code_file,
       CAST(e % 1000 AS INT) AS line,
       'Ns::Class::Fn' || CAST(u % 11 AS VARCHAR) AS function,
       CASE WHEN e % 3 <> 0
            THEN 'event ' || CAST(e AS VARCHAR) || ' marker user'
                 || CASE WHEN u % 100 < 10 THEN '0' ELSE '' END
                 || CAST(u % 100 AS VARCHAR)
            ELSE '' END AS params
FROM b""",
        "streaming_evtx": """WITH b AS (
  SELECT event_id AS e, user_id AS u,
         epoch_us(CAST(ts AS TIMESTAMP)) AS eus
  FROM events),
r AS (
  SELECT CAST(e % 2 AS INT) AS fb, e, u,
         eus - CASE WHEN e % 7 = 0 THEN 3600000000 ELSE 0 END AS tus,
         CAST(row_number() OVER (PARTITION BY e % 2 ORDER BY e) - 1
              AS INT) AS rec_idx,
         '<Event><EventID>' || CAST(e AS VARCHAR)
           || '</EventID><Provider>prov' || CAST(u % 10 AS VARCHAR)
           || '</Provider></Event>' AS payload
  FROM b)
SELECT 'f' || CAST(fb AS VARCHAR) AS source_label,
       rec_idx,
       CAST(e + 1 AS BIGINT) AS record_id,
       make_timestamp(tus) AS ts,
       payload,
       CAST(length(payload) AS INT) AS payload_len
FROM r""",
        "streaming_journal": """WITH b AS (
  SELECT event_id AS e, user_id AS u,
         epoch_us(CAST(ts AS TIMESTAMP)) AS eus
  FROM events)
SELECT 'f' || CAST(CAST(e % 2 AS INT) AS VARCHAR) AS source_label,
       CAST(row_number() OVER (PARTITION BY e % 2 ORDER BY e) - 1
            AS INT) AS rec_idx,
       CAST(e + 1 AS BIGINT) AS seqnum,
       make_timestamp(eus) AS ts,
       CAST(eus % 86400000000 AS BIGINT) AS monotonic_us,
       'svc event ' || CAST(e AS VARCHAR) AS message,
       'host' || CAST(u % 5 AS VARCHAR) AS hostname,
       'daemon' || CAST(e % 3 AS VARCHAR) AS identifier,
       CAST(100 + u % 50 AS INT) AS pid
FROM b""",
        "evtx_records": """WITH b AS (
  SELECT event_id AS e, user_id AS u,
         epoch_us(CAST(ts AS TIMESTAMP)) AS eus
  FROM events),
r AS (
  SELECT CAST(e % 2 AS INT) AS fb, e, u,
         eus - CASE WHEN e % 7 = 0 THEN 3600000000 ELSE 0 END AS tus,
         CAST(row_number() OVER (PARTITION BY e % 2 ORDER BY e) - 1
              AS INT) AS rec_idx,
         '<Event><EventID>' || CAST(e AS VARCHAR)
           || '</EventID><Provider>prov' || CAST(u % 10 AS VARCHAR)
           || '</Provider></Event>' AS payload
  FROM b)
SELECT 'f' || CAST(fb AS VARCHAR) AS source_label,
       rec_idx,
       CAST(e + 1 AS BIGINT) AS record_id,
       make_timestamp(tus) AS ts,
       payload,
       CAST(length(payload) AS INT) AS payload_len,
       CAST(CASE WHEN lag(tus) OVER (PARTITION BY fb ORDER BY rec_idx)
                      > tus
                 THEN 1 ELSE 0 END AS INT) AS ooo,
       CAST(row_number() OVER (PARTITION BY fb ORDER BY tus, rec_idx)
            - 1 AS INT) AS sorted_idx
FROM r""",
        "journal_records": """WITH b AS (
  SELECT event_id AS e, user_id AS u,
         epoch_us(CAST(ts AS TIMESTAMP)) AS eus
  FROM events)
SELECT 'f' || CAST(CAST(e % 2 AS INT) AS VARCHAR) AS source_label,
       CAST(row_number() OVER (PARTITION BY e % 2 ORDER BY e) - 1
            AS INT) AS rec_idx,
       CAST(e + 1 AS BIGINT) AS seqnum,
       make_timestamp(eus) AS ts,
       CAST(eus % 86400000000 AS BIGINT) AS monotonic_us,
       'svc event ' || CAST(e AS VARCHAR) AS message,
       'host' || CAST(u % 5 AS VARCHAR) AS hostname,
       'daemon' || CAST(e % 3 AS VARCHAR) AS identifier,
       CAST(100 + u % 50 AS INT) AS pid
FROM b""",
        "pattern_counts": f"""{b}
SELECT _pattern_id AS pattern_id, CAST(count(*) AS BIGINT) AS rows
FROM exp WHERE _pattern_id IS NOT NULL GROUP BY 1""",
        "sink_counts": f"""{b}
SELECT sink_eff AS sink, CAST(count(*) AS BIGINT) AS rows FROM asm GROUP BY 1""",
        "hourly_hist": f"""{b}
SELECT date_trunc('hour', ts_eff) AS hour, CAST(count(*) AS BIGINT) AS rows
FROM asm WHERE ts_eff IS NOT NULL GROUP BY 1""",
        "streaming_hourly": f"""{b}
SELECT date_trunc('hour', _ts_parsed) AS hour, _sink AS sink,
       CAST(count(*) AS BIGINT) AS rows
FROM exp
WHERE _ts_parsed IS NOT NULL AND _sink <> 'dmesg_uptime'
GROUP BY 1, 2""",
        "streaming_dedup": f"""{b}
SELECT DISTINCT md5(text) AS digest, text FROM exp""",
        "streaming_assembly": f"""{b}
SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx,
       CAST(msg_turn_idx AS INT) AS msg_turn_idx,
       ts_eff,
       sink_eff
FROM asm""",
        "conv_summary": f"""{b},
oo AS (
  SELECT conv_id, turn_idx, _ts_parsed,
         lag(_ts_parsed) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_ts
  FROM exp WHERE _ts_parsed IS NOT NULL
)
SELECT e.conv_id,
       CAST(count(*) AS BIGINT) AS turns,
       CAST(count(e._ts_parsed) AS BIGINT) AS syslines,
       CAST(max(octet_length(encode(e.text))) AS INT) AS longest_line,
       min(e._ts_parsed) AS dt_first,
       max(e._ts_parsed) AS dt_last,
       CAST(coalesce(o.ooo, 0) AS BIGINT) AS out_of_order
FROM exp e
LEFT JOIN (
  SELECT conv_id, CAST(sum(CASE WHEN _ts_parsed < prev_ts THEN 1 ELSE 0 END) AS BIGINT) AS ooo
  FROM oo GROUP BY conv_id
) o USING (conv_id)
GROUP BY e.conv_id, o.ooo""",
        "routed_enriched": f"""{w}
SELECT a.sink_eff AS sink, r.role_kind,
       CAST(count(*) AS BIGINT) AS rows,
       CAST(sum(CASE WHEN t.is_agentic THEN 1 ELSE 0 END) AS BIGINT) AS agentic_rows,
       CAST(sum(r.role_weight) AS BIGINT) AS weight_sum
FROM asm a
LEFT JOIN dim_role r USING (role)
LEFT JOIN dim_tool t USING (tool)
GROUP BY 1, 2""",
        "global_summary": f"""{b}
SELECT CAST(count(*) AS BIGINT) AS rows_total,
       CAST(count(_ts_parsed) AS BIGINT) AS syslines_total,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS bytes_texts,
       min(ts_eff) AS dt_first,
       max(ts_eff) AS dt_last,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS convs
FROM asm""",
        "sysline_assembly": f"""{b}
SELECT conv_id, CAST(msg_turn_idx AS INT) AS msg_turn_idx,
       CAST(count(*) AS BIGINT) AS lines
FROM asm WHERE msg_turn_idx IS NOT NULL GROUP BY 1, 2""",
        "dt_window_sinks": f"""{b}
SELECT sink_eff AS sink, CAST(count(*) AS BIGINT) AS rows
FROM asm WHERE {rng} GROUP BY 1""",
        "conv_dominant_pattern": f"""{b},
pc AS (
  SELECT conv_id, _pattern_id AS pattern_id, count(*) AS matches
  FROM exp WHERE _pattern_id IS NOT NULL GROUP BY 1, 2),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id
           ORDER BY matches DESC, pattern_id) AS rn
  FROM pc)
SELECT conv_id, pattern_id AS dominant_pattern_id,
       CAST(matches AS BIGINT) AS matches
FROM rk WHERE rn = 1""",
        "sft_pairs": f"""{b},
f AS (
  SELECT conv_id, turn_idx, role, text,
    min(CASE WHEN role = 'assistant' THEN turn_idx END) OVER w AS asst_idx,
    min(CASE WHEN role = 'user' THEN turn_idx END) OVER w AS next_user_idx,
    min_by(CASE WHEN role = 'assistant' THEN text END,
           CASE WHEN role = 'assistant' THEN turn_idx END) OVER w AS response
  FROM exp
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
SELECT conv_id, turn_idx AS user_idx, CAST(asst_idx AS INT) AS asst_idx,
       text AS prompt, response
FROM f
WHERE role = 'user' AND asst_idx IS NOT NULL
  AND (next_user_idx IS NULL OR asst_idx < next_user_idx)""",
        "conv_chunks": f"""{b},
c AS (
  SELECT conv_id, turn_idx,
    list(role || ': ' || text) OVER w AS ctx,
    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM exp
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
SELECT conv_id, turn_idx, CAST(len(ctx) AS INT) AS n_ctx,
       array_to_string(ctx, chr(10)) AS chunk_text
FROM c WHERE (rn - 1) % 2 = 0""",
        "rollout_tree": f"""{b},
{_ROLLOUTS_CTE}
p AS (
  SELECT conv_id, row_number() OVER wo AS depth,
    md5(string_agg(role || ':' || text, chr(10)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx
      ROWS UNBOUNDED PRECEDING)) AS prefix_key
  FROM r
  WINDOW wo AS (PARTITION BY conv_id ORDER BY turn_idx)),
pp AS (
  SELECT *, lag(prefix_key) OVER (
    PARTITION BY conv_id ORDER BY depth) AS parent_key FROM p),
nodes AS (
  SELECT depth, prefix_key, CAST(count(*) AS BIGINT) AS n_convs
  FROM pp GROUP BY 1, 2),
ch AS (
  SELECT parent_key,
         CAST(count(DISTINCT prefix_key) AS BIGINT) AS n_children
  FROM pp WHERE parent_key IS NOT NULL GROUP BY 1)
SELECT CAST(depth AS INT) AS depth, nodes.prefix_key AS prefix_key,
       n_convs, COALESCE(ch.n_children, 0) AS n_children
FROM nodes LEFT JOIN ch ON nodes.prefix_key = ch.parent_key""",
        "streaming_scores": f"""{b},
{_ROLLOUTS_CTE}
{_CONV_SCORES_CTE}
fin AS (SELECT conv_id, prompt_key, score FROM t)
SELECT conv_id, prompt_key, score FROM fin""",
        "best_of_n": f"""{b},
{_ROLLOUTS_CTE}
{_CONV_SCORES_CTE}
rk AS (
  SELECT *, row_number() OVER (
      PARTITION BY prompt_key ORDER BY score DESC, conv_id) AS rb,
    count(*) OVER (PARTITION BY prompt_key) AS nr
  FROM t)
SELECT prompt_key, CAST(nr AS BIGINT) AS n_rollouts,
       conv_id AS best_conv, score AS best_score
FROM rk WHERE rb = 1""",
        "preference_pairs": f"""{b},
{_ROLLOUTS_CTE}
{_CONV_SCORES_CTE}
rk AS (
  SELECT *, row_number() OVER (
      PARTITION BY prompt_key ORDER BY score DESC, conv_id) AS rb,
    row_number() OVER (
      PARTITION BY prompt_key ORDER BY score ASC, conv_id DESC) AS rw
  FROM t),
c AS (SELECT prompt_key, conv_id AS chosen_conv,
             score AS chosen_score FROM rk WHERE rb = 1),
j AS (SELECT prompt_key, conv_id AS rejected_conv,
             score AS rejected_score FROM rk WHERE rw = 1)
SELECT c.prompt_key AS prompt_key, chosen_conv, rejected_conv,
       chosen_score, rejected_score,
       CAST(chosen_score - rejected_score AS BIGINT) AS margin
FROM c JOIN j USING (prompt_key)
WHERE chosen_score > rejected_score""",
        "grpo_advantage": f"""{b},
{_ROLLOUTS_CTE}
{_CONV_SCORES_CTE}
g AS (
  SELECT *, count(*) OVER (PARTITION BY prompt_key) AS n,
         sum(score) OVER (PARTITION BY prompt_key) AS s
  FROM t)
SELECT prompt_key, conv_id, score,
       CAST(n AS BIGINT) AS n_rollouts,
       CAST((1000 * (n * score - s)) // n AS BIGINT) AS adv_permille
FROM g""",
        "bt_ratings": f"""{b},
{_ROLLOUTS_CTE}
{_CONV_SCORES_CTE}
scp AS (
  SELECT prompt_key,
         CASE WHEN strpos(conv_id, '#') > 0
              THEN substr(conv_id, strpos(conv_id, '#') + 1)
              ELSE 'base' END AS player
  FROM t),
sc AS MATERIALIZED (
  SELECT prompt_key, player,
         {_hex13_sql("prompt_key || '|' || player || '|rm1'")} AS score
  FROM scp),
outc AS MATERIALIZED (
  SELECT a.prompt_key,
         CASE WHEN a.score > b2.score THEN a.player
              ELSE b2.player END AS winner,
         CASE WHEN a.score > b2.score THEN b2.player
              ELSE a.player END AS loser
  FROM sc a JOIN sc b2
    ON a.prompt_key = b2.prompt_key AND a.player < b2.player
  WHERE a.score <> b2.score),
{rank.bt_oracle_cte("outc", n_iter=6)}""",
        "tool_pagerank": f"""{b},
te AS (
  SELECT conv_id, turn_idx, tool,
         lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM exp WHERE tool <> 'none'),
ed AS MATERIALIZED (
  SELECT prev AS src, tool AS dst, CAST(count(*) AS BIGINT) AS weight
  FROM te WHERE prev IS NOT NULL GROUP BY 1, 2),
{graph.pagerank_oracle_cte("ed", n_iter=3)}""",
        "tool_triangles": f"""{b},
te AS (
  SELECT conv_id, turn_idx, tool,
         lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM exp WHERE tool <> 'none'),
ed AS MATERIALIZED (
  SELECT prev AS src, tool AS dst FROM te WHERE prev IS NOT NULL),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ed WHERE src <> dst)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
  SELECT unnest([e1.a, e1.b, e2.b]) AS node
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
GROUP BY 1""",
        "pack_sft": f"""{b},
cl AS (
  SELECT conv_id,
         CAST(sum(length(role) + 2 + length(text) + 1) AS BIGINT) AS len
  FROM exp GROUP BY conv_id),
cs AS (
  SELECT conv_id, len,
         COALESCE(sum(len) OVER (ORDER BY conv_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM cl),
cp AS (
  SELECT conv_id, s, s // 2000 AS pack_id FROM cs),
cq AS (
  SELECT conv_id, pack_id,
         s - min(s) OVER (PARTITION BY pack_id) AS conv_off
  FROM cp),
mm AS (
  SELECT conv_id, turn_idx, role,
    COALESCE(sum(length(role) + 2 + length(text) + 1) OVER (
      PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + length(role) + 2 AS st, length(text) AS tl
  FROM exp)
SELECT CAST(pack_id AS BIGINT) AS pack_id, mm.conv_id AS conv_id, turn_idx,
       CAST(st + conv_off AS BIGINT) AS span_start,
       CAST(st + tl + conv_off AS BIGINT) AS span_end
FROM mm JOIN cq ON mm.conv_id = cq.conv_id
WHERE role = 'assistant'""",
        "loss_mask_spans": f"""{b},
m AS (
  SELECT conv_id, turn_idx, role,
    COALESCE(sum(length(role) + 2 + length(text) + 1) OVER (
      PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + length(role) + 2 AS span_start,
    length(text) AS tl
  FROM exp)
SELECT conv_id, turn_idx,
       CAST(span_start AS BIGINT) AS span_start,
       CAST(span_start + tl AS BIGINT) AS span_end
FROM m WHERE role = 'assistant'""",
        "role_alternation": f"""{b},
l AS (
  SELECT conv_id, turn_idx, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pr
  FROM exp),
a AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
         min_by(role, turn_idx) AS first_role,
         max_by(role, turn_idx) AS last_role,
         CAST(sum(CASE WHEN role = pr THEN 1 ELSE 0 END) AS BIGINT)
           AS n_adjacent_dups,
         max(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS ha
  FROM l GROUP BY conv_id)
SELECT conv_id, n_turns, first_role, last_role, n_adjacent_dups,
       (first_role = 'user' AND last_role = 'assistant'
        AND n_adjacent_dups = 0 AND ha = 1) AS alternation_ok
FROM a""",
        "fim_split": f"""WITH c1 AS (
  SELECT doc_id, text, length(text) AS n,
         CAST(1 + ({_hex13_sql("CAST(doc_id AS VARCHAR) || '#a#fim1'")})
              % (length(text) - 2) AS INT) AS cut1
  FROM documents WHERE length(text) >= 3),
c2 AS (
  SELECT *, CAST(cut1 + 1 +
         ({_hex13_sql("CAST(doc_id AS VARCHAR) || '#b#fim1'")})
         % (n - cut1 - 1) AS INT) AS cut2
  FROM c1)
SELECT CAST(doc_id AS BIGINT) AS doc_id, cut1, cut2,
       '<PRE>' || substr(text, 1, cut1)
       || '<SUF>' || substr(text, cut2 + 1, n - cut2)
       || '<MID>' || substr(text, cut1 + 1, cut2 - cut1) AS fim_text
FROM c2""",
        "token_budget_sample": f"""WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ({_hex13_sql("CAST(doc_id AS VARCHAR) || '#' || source || '#budget1'")}) AS h,
         CASE {_TOKEN_BUDGET_CASE} ELSE -1 END AS budget
  FROM documents),
c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM t WHERE budget >= 0)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c
WHERE cum_tokens <= budget OR (cum_tokens = n_tokens AND budget > 0)""",
        **_training_data_oracles(),
    }


# budget map of q_token_budget_sample as a SQL CASE (sources src0,
# src2, ..., src18 with budget 150*(k+1) tokens; others dropped)
_TOKEN_BUDGET_CASE = " ".join(
    f"WHEN source = 'src{k}' THEN {150 * (k + 1)}"
    for k in range(0, 20, 2)
)


# rollout augmentation over the exp transcripts (DuckDB side of
# _rollouts): convs with cnum % 5 == 0 gain rollouts #r1/#r2 sharing
# the first ceil(n/2) turns.  Trailing comma: callers append CTEs.
_ROLLOUTS_CTE = """
rb AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         (count(*) OVER (PARTITION BY conv_id) + 1) // 2 AS half,
         CAST(substr(conv_id, 6) AS INT) AS cnum
  FROM exp),
r AS (
  SELECT conv_id, turn_idx, role, text, tool, ts FROM rb
  UNION ALL
  SELECT conv_id || '#r' || CAST(rno AS VARCHAR), turn_idx, role,
         CASE WHEN turn_idx >= half
              THEN text || ' (alt ' || CAST(rno AS VARCHAR) || ')'
              ELSE text END,
         tool, ts
  FROM rb CROSS JOIN (SELECT unnest([1, 2]) AS rno) u
  WHERE cnum % 5 = 0),
"""

# per-conversation (prompt_key, score) over the rollouts relation
_CONV_SCORES_CTE = """
t AS (
  SELECT conv_id, md5(min_by(text, turn_idx)) AS prompt_key,
         CAST(sum(CASE WHEN role = 'assistant' THEN length(text)
                       ELSE 0 END) AS BIGINT) AS score
  FROM r GROUP BY conv_id),
"""

_SHINGLES_CTE = """
w AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws FROM documents),
shx AS (SELECT doc_id, lang, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i, ws FROM w),
sh AS (SELECT DISTINCT doc_id, lang, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle FROM shx)
"""

_NIB_CASE = (
    "CASE substr(h, p, 1) "
    + " ".join(f"WHEN '{c}' THEN {int(c, 16)}" for c in "0123456789abcdef")
    + " END"
)
_HEX_CASE = (
    "CASE nv "
    + " ".join(f"WHEN {v} THEN '{format(v, 'x')}'" for v in range(16))
    + " END"
)

_STOPS = "('the','a','of','and','to','in','is','it','that','for')"


def _hex13_sql(expr: str) -> str:
    """DuckDB: first 13 hex digits of md5(expr) → BIGINT (the same
    52-bit hash operators/sketch.py computes with Spark's conv)."""
    def nib(i: int) -> str:
        cases = " ".join(
            f"WHEN '{c}' THEN {int(c, 16)}" for c in "0123456789abcdef"
        )
        return (
            f"CAST((CASE substr(md5({expr}), {i}, 1) {cases} END)"
            " AS BIGINT)"
        )

    return (
        "("
        + " + ".join(f"{nib(i)} * {16 ** (13 - i)}" for i in range(1, 14))
        + ")"
    )

def _morton_sql(bits: int) -> str:
    """DuckDB twin of operators/layout.py zorder_key's bit
    interleave over columns x, y."""
    return " + ".join(
        f"(((x >> {i}) & 1) << {2 * i})"
        f" + (((y >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )


def _hll_sql(src_rel: str, src_label: str, col: str) -> str:
    """DuckDB twin of operators/sketch.py hll_distinct at p=8 over
    `col` from relation `src_rel`, as one parenthesized SELECT —
    same 52-bit hash, integer harmonic-sum numerator, ppm alpha, and
    the identical precomputed linear-counting literals."""
    from super_speedy_syslog_searcher_spark.operators.sketch import (
        _alpha_ppm,
        lc_table,
    )

    m, rb1 = 256, 45
    alpha = _alpha_ppm(m)
    lc = ", ".join(str(v) for v in lc_table(m))
    big = m * m * (1 << rb1)
    return f"""
(SELECT '{src_label}' AS src, CAST({m} AS INT) AS m,
        CAST(used AS BIGINT) AS n_buckets_used,
        CAST(s_int AS BIGINT) AS s_int,
        CAST(est_raw AS BIGINT) AS est_raw,
        CAST(CASE WHEN est_raw <= {5 * m // 2} AND used < {m}
             THEN ([{lc}])[CAST({m} - used AS INT)]
             ELSE est_raw END AS BIGINT) AS est_distinct
 FROM (
  SELECT used, s_int,
         (raw // 1000000) * {alpha}
           + ((raw % 1000000) * {alpha}) // 1000000 AS est_raw
  FROM (
    SELECT used, s_int, CAST({big} AS BIGINT) // s_int AS raw
    FROM (
      SELECT count(*) AS used,
             CAST(sum(CAST(1 AS BIGINT) << ({rb1} - maxrho)) AS BIGINT)
               + ({m} - count(*)) * (CAST(1 AS BIGINT) << {rb1}) AS s_int
      FROM (
        SELECT CAST(hv % {m} AS INT) AS bucket,
               max(CASE WHEN hv // {m} = 0 THEN {rb1}
                   ELSE {rb1} - length(bin(hv // {m})) END) AS maxrho
        FROM (SELECT ({_hex13_sql(col)}) AS hv FROM {src_rel}) hh
        GROUP BY 1) rr ) aa ) ww ) ee)
"""


def _hourly_uniques_sql() -> str:
    """DuckDB twin of temporal.hourly_uniques (p=8): per-hour exact
    distinct beside the per-group HLL integer estimate with the same
    precomputed linear-counting literals."""
    from super_speedy_syslog_searcher_spark.operators.sketch import (
        _alpha_ppm,
        lc_table,
    )

    m, rb1 = 256, 45
    alpha = _alpha_ppm(m)
    lc = ", ".join(str(v) for v in lc_table(m))
    big = m * m * (1 << rb1)
    return f"""WITH hr AS (
  SELECT date_trunc('hour', ts) AS hour, user_id FROM events),
h AS (SELECT hour, ({_hex13_sql("CAST(user_id AS VARCHAR)")}) AS hv FROM hr),
r AS (SELECT hour, CAST(hv % {m} AS INT) AS bucket,
        max(CASE WHEN hv // {m} = 0 THEN {rb1}
            ELSE {rb1} - length(bin(hv // {m})) END) AS maxrho
      FROM h GROUP BY 1, 2),
a AS (SELECT hour, count(*) AS used,
        CAST(sum(CAST(1 AS BIGINT) << ({rb1} - maxrho)) AS BIGINT)
          + ({m} - count(*)) * (CAST(1 AS BIGINT) << {rb1}) AS s_int
      FROM r GROUP BY 1),
w2 AS (SELECT hour, used, CAST({big} AS BIGINT) // s_int AS raw FROM a),
e2 AS (SELECT hour, used,
        (raw // 1000000) * {alpha}
          + ((raw % 1000000) * {alpha}) // 1000000 AS est_raw
       FROM w2),
x AS (SELECT hour, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_uniques
      FROM hr GROUP BY 1)
SELECT x.hour AS hour, exact_uniques,
       CAST(CASE WHEN est_raw <= {5 * m // 2} AND used < {m}
            THEN ([{lc}])[CAST({m} - used AS INT)]
            ELSE est_raw END AS BIGINT) AS hll_uniques
FROM x JOIN e2 ON x.hour = e2.hour"""


_SESSIONIZE_SQL = """WITH g AS (
  SELECT event_id, user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 7200000000
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sidx
  FROM g)
SELECT CAST(user_id AS VARCHAR) || '#' || CAST(sidx AS VARCHAR) AS session_id,
       CAST(user_id AS BIGINT) AS user_id,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT) AS duration_s
FROM s GROUP BY 1, 2"""


_ANN_NORM_CTE = """
n AS (SELECT vec_id, embedding,
  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings),
p AS (SELECT vec_id AS probe_id, embedding AS pv, nrm AS pn FROM n WHERE vec_id < 10)
"""

_DOT = (
    "list_sum(list_transform(list_zip(pv, n.embedding), "
    "t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))"
)


def _training_data_oracles() -> dict[str, str]:
    b = O.base()
    minhash_sig = ", ".join(
        f"min(md5(shingle || '#{i}')) AS m{i}" for i in range(8)
    )
    lines_cte = lines.synth_lines_sql("duckdb")
    # plain-string concat (not f-strings): the C4 rules mention curly
    # braces literally.
    c4_oracle = (
        "WITH ln AS ("
        + lines_cte
        + """),
fl AS (
  SELECT doc_id, line_pos, line,
    (len(list_filter(string_split(line, ' '), w -> w <> '')) >= 5
     AND right(trim(line), 1) IN ('.', '!', '?', '"')
     AND NOT contains(lower(line), 'javascript')) AS keep_line,
    (contains(line, '{') OR contains(line, '}')) AS has_brace,
    contains(lower(line), 'lorem ipsum') AS has_lorem
  FROM ln),
ag AS (
  SELECT doc_id,
    CAST(count(*) AS BIGINT) AS n_lines,
    CAST(sum(CASE WHEN keep_line THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
    max(CASE WHEN has_brace THEN 1 ELSE 0 END) AS any_brace,
    max(CASE WHEN has_lorem THEN 1 ELSE 0 END) AS any_lorem,
    string_agg(line, chr(10) ORDER BY line_pos)
      FILTER (WHERE keep_line) AS ctext
  FROM fl GROUP BY doc_id)
SELECT doc_id, n_lines, n_kept,
  CAST(CASE WHEN any_brace = 0 AND any_lorem = 0 AND n_kept >= 3
       THEN 1 ELSE 0 END AS INT) AS kept_doc,
  CASE WHEN any_brace = 0 AND any_lorem = 0 AND n_kept >= 3
       THEN ctext END AS clean_text
FROM ag"""
    )
    # doc_id*100000+line_pos reproduces min(struct(doc_id, line_pos)):
    # per-doc line counts are far below 100000.
    line_dedup_oracle = (
        "WITH ln AS ("
        + lines_cte
        + """),
f AS (
  SELECT line, count(*) AS n_occ,
         min(doc_id * 100000 + line_pos) AS ford
  FROM ln GROUP BY line),
t AS (
  SELECT l.doc_id, l.line_pos, l.line,
    (f.n_occ = 1 OR l.doc_id * 100000 + l.line_pos = f.ford) AS keep
  FROM ln l JOIN f USING (line))
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
  coalesce(string_agg(line, chr(10) ORDER BY line_pos)
           FILTER (WHERE keep), '') AS clean_text
FROM t GROUP BY doc_id"""
    )
    return {
        "c4_filter": c4_oracle,
        "line_dedup": line_dedup_oracle,
        "dedup_exact": """
SELECT md5(text) AS digest, CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1 HAVING count(*) > 1""",
        "dedup_minhash_lsh": f"""WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {minhash_sig} FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(m0 || m1 || m2 || m3) AS bval FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(m4 || m5 || m6 || m7) AS bval FROM sig)
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id""",
        "dedup_ngram_jaccard": f"""WITH {_SHINGLES_CTE},
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
                      AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
j AS (
  SELECT doc_a, doc_b,
         round(shared / (sa.n_sh + sb.n_sh - shared), 4) AS jaccard
  FROM shared
  JOIN sz sa ON doc_a = sa.doc_id
  JOIN sz sb ON doc_b = sb.doc_id)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b, jaccard
FROM j WHERE jaccard >= 0.2""",
        "prefix_join": f"""WITH {_SHINGLES_CTE},
sz AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
cand AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.lang = b.lang
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
jj AS (
  SELECT doc_a, doc_b, shared, sa.n + sb.n - shared AS uni
  FROM cand JOIN sz sa ON sa.doc_id = doc_a
            JOIN sz sb ON sb.doc_id = doc_b)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(shared AS BIGINT) AS shared, CAST(uni AS BIGINT) AS uni,
       CAST((1000 * shared) // uni AS BIGINT) AS jaccard_permille
FROM jj WHERE shared * 5 >= 4 * uni""",
        "dedup_lsh_verified": f"""WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {minhash_sig} FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(m0 || m1 || m2 || m3) AS bval FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(m4 || m5 || m6 || m7) AS bval FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS shared
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2),
j AS (
  SELECT doc_a, doc_b,
         round(shared / (sa.n_sh + sb.n_sh - shared), 4) AS jaccard
  FROM shared
  JOIN sz sa ON doc_a = sa.doc_id
  JOIN sz sb ON doc_b = sb.doc_id)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b, jaccard
FROM j WHERE jaccard >= 0.2""",
        "dedup_clusters": f"""WITH RECURSIVE {_SHINGLES_CTE},
sig AS (SELECT doc_id, {minhash_sig} FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(m0 || m1 || m2 || m3) AS bval FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(m4 || m5 || m6 || m7) AS bval FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS shared
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2),
vp AS (
  SELECT doc_a, doc_b FROM shared
  JOIN sz sa ON doc_a = sa.doc_id
  JOIN sz sb ON doc_b = sb.doc_id
  WHERE round(shared / (sa.n_sh + sb.n_sh - shared), 4) >= 0.2),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM vp
  UNION SELECT doc_b, doc_a FROM vp),
walk(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node),
cc AS (SELECT node, min(lbl) AS cluster_id FROM walk GROUP BY node),
csz AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY 1)
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       node = cluster_id AS is_canonical
FROM cc JOIN csz USING (cluster_id)""",
        "dedup_survivors": f"""WITH RECURSIVE {_SHINGLES_CTE},
sig AS (SELECT doc_id, {minhash_sig} FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(m0 || m1 || m2 || m3) AS bval FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(m4 || m5 || m6 || m7) AS bval FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS shared
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2),
vp AS (
  SELECT doc_a, doc_b FROM shared
  JOIN sz sa ON doc_a = sa.doc_id
  JOIN sz sb ON doc_b = sb.doc_id
  WHERE round(shared / (sa.n_sh + sb.n_sh - shared), 4) >= 0.2),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM vp
  UNION SELECT doc_b, doc_a FROM vp),
walk(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node),
cc AS (SELECT node, min(lbl) AS cluster_id FROM walk GROUP BY node),
qual AS (
  SELECT doc_id,
         CAST(floor(((len(list_filter(list_distinct(string_split(lower(text), ' ')),
               w -> w IN ('the','a','of','and','to','in','is','it','that','for')))
               / len(string_split(lower(text), ' '))) * 2.0
             - (len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) / length(text))
             + least(length(text) / 500.0, 1.0)) * 10000 + 0.5) AS BIGINT)
           AS quality_x10k
  FROM documents),
j AS (
  SELECT cc.node AS doc_id, cc.cluster_id, q.quality_x10k,
         row_number() OVER (PARTITION BY cc.cluster_id
                            ORDER BY q.quality_x10k DESC, cc.node) AS rk
  FROM cc JOIN qual q ON q.doc_id = cc.node)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(cluster_id AS BIGINT) AS cluster_id,
       quality_x10k,
       CAST(rk = 1 AS INT) AS is_survivor
FROM j""",
        "curriculum_bins": """WITH qual AS (
  SELECT doc_id,
         CAST(floor(((len(list_filter(list_distinct(string_split(lower(text), ' ')),
               w -> w IN ('the','a','of','and','to','in','is','it','that','for')))
               / len(string_split(lower(text), ' '))) * 2.0
             - (len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) / length(text))
             + least(length(text) / 500.0, 1.0)) * 10000 + 0.5) AS BIGINT)
           AS quality_x10k
  FROM documents),
freq AS (SELECT quality_x10k AS v, count(*) AS c FROM qual GROUP BY 1),
cum AS (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
        FROM freq),
tot AS (SELECT count(*) AS n FROM qual),
qs AS (SELECT unnest([100,200,300,400,500,600,700,800,900]) AS q),
r AS (SELECT q, (q * n + 999) // 1000 AS k FROM qs, tot),
th AS (SELECT q, min(CASE WHEN cum >= k THEN v END) AS value
       FROM r, cum GROUP BY q, k)
SELECT doc_id, quality_x10k,
       CAST(coalesce(sum(CASE WHEN quality_x10k > value THEN 1 ELSE 0 END), 0)
            AS INT) AS bin
FROM qual CROSS JOIN th GROUP BY 1, 2""",
        "sessionize": _SESSIONIZE_SQL,
        "streaming_sessions": _SESSIONIZE_SQL,
        "asof_join": """WITH a AS (
  SELECT event_id, user_id, ts, event_type, value,
    last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      OVER w AS asof_value,
    last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
      OVER w AS asof_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       ts, event_type, value, asof_value, asof_ts,
       CAST((epoch_us(ts) - epoch_us(asof_ts)) // 1000000 AS BIGINT) AS asof_lag_s
FROM a""",
        "asof_tables": """WITH r AS (
  SELECT user_id, ts, max_by(value, event_id) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
SELECT CAST(l.event_id AS BIGINT) AS event_id,
       CAST(l.user_id AS BIGINT) AS user_id,
       l.ts, r.value AS asof_value, r.ts AS asof_ts
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "repetition_metrics": """WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS tok FROM w),
tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
tstat AS (SELECT doc_id, max(c) AS max_tok, sum(c) AS n_tokens FROM tc GROUP BY 1),
bgx AS (SELECT doc_id, unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS i, ws FROM w),
bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg FROM bgx),
bs AS (SELECT doc_id, count(*) AS n_bg, count(DISTINCT bg) AS n_bg_d FROM bg GROUP BY 1)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((1000 * max_tok) // n_tokens AS BIGINT) AS top_tok_permille,
       CAST(coalesce((1000 * (n_bg - n_bg_d)) // n_bg, 0) AS BIGINT) AS dup_bigram_permille,
       ((1000 * max_tok) // n_tokens >= 200
        OR coalesce((1000 * (n_bg - n_bg_d)) // n_bg, 0) >= 300) AS is_repetitive
FROM tstat LEFT JOIN bs USING (doc_id)""",
        "mixture_sample": f"""WITH k AS (
  SELECT * FROM documents
  WHERE ({_hex13_sql("CAST(doc_id AS VARCHAR) || '#' || source || '#mix1'")}) % 1000
        < (CAST(substr(source, 4) AS INT) % 20) * 50)
SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM k GROUP BY source""",
        "unigram_logprob": """WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c) AS T FROM freq),
vocab AS (
  SELECT tok,
         CAST(floor(-1000000.0 * ln(CAST(c AS DOUBLE) / CAST(T AS DOUBLE))) AS BIGINT) AS nll_micro
  FROM freq, tot)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(nll_micro) AS BIGINT) AS nll_micro_sum,
       CAST(sum(nll_micro) // count(*) AS BIGINT) AS nll_per_tok_micro
FROM tok JOIN vocab USING (tok)
GROUP BY doc_id""",
        "bigram_logprob": """WITH tw AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
tok AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, ws FROM tw),
bg AS (
  SELECT doc_id, ws[pos] AS w1, ws[pos+1] AS w2
  FROM tok WHERE pos < len(ws)),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
lm AS (
  SELECT w1, w2,
         CAST(floor(-1000000.0 * ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))) AS BIGINT) AS nll_micro
  FROM c2 JOIN c1 USING (w1))
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(nll_micro) AS BIGINT) AS nll_micro_sum,
       CAST(sum(nll_micro) // count(*) AS BIGINT) AS nll_per_bigram_micro
FROM bg JOIN lm USING (w1, w2)
GROUP BY doc_id""",
        # bpe_train has no oracle entry: merge training is genuinely
        # iterative (merge k rewrites the table merge k+1 counts over),
        # so no single SQL statement expresses it; the driver records
        # the rows-only check and tests/test_bpe.py pins equivalence
        # against a naive single-machine trainer on randomized corpora.
        "kmeans_embed": cluster.kmeans_oracle_sql(k=8, n_iter=4),
        "pq_topk": pq.pq_oracle_sql(),
        "ivf_pq": pq.ivf_pq_oracle_sql(),
        "temperature_mix": f"""WITH cnt AS MATERIALIZED (
  SELECT source AS k, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1),
sq AS MATERIALIZED (
  SELECT k, (SELECT max(i) FROM generate_series(0, 10000) t(i)
             WHERE i * i <= cnt.n) AS s
  FROM cnt),
tgt AS MATERIALIZED (
  SELECT k, (200 * s) // (SELECT sum(s) FROM sq) AS target FROM sq),
rk AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY {_hex13_sql(
               "CAST(doc_id AS VARCHAR) || '#' || source || '#temp1'"
           )}, doc_id) AS BIGINT) AS pick_rank
  FROM documents)
SELECT CAST(rk.doc_id AS BIGINT) AS doc_id, rk.source AS source,
       pick_rank
FROM rk JOIN tgt ON tgt.k = rk.source
WHERE pick_rank <= tgt.target""",
        "rollout_diversity": f"""{b},
{_ROLLOUTS_CTE}
pk AS MATERIALIZED (
  SELECT conv_id, md5(min_by(text, turn_idx)) AS prompt_key
  FROM r GROUP BY 1),
nr AS (SELECT prompt_key, CAST(count(*) AS BIGINT) AS n_rollouts
       FROM pk GROUP BY 1),
aw AS (
  SELECT pk.prompt_key, string_split(t.text, ' ') AS ws
  FROM r t JOIN pk USING (conv_id) WHERE t.role = 'assistant'),
bgx AS (
  SELECT prompt_key, unnest(generate_series(1, len(ws) - 1)) AS i, ws
  FROM aw WHERE len(ws) >= 2),
bgr AS (SELECT prompt_key, ws[i] || ' ' || ws[i + 1] AS bg FROM bgx),
st AS (
  SELECT prompt_key, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(count(DISTINCT bg) AS BIGINT) AS n_distinct
  FROM bgr GROUP BY 1)
SELECT st.prompt_key AS prompt_key, nr.n_rollouts, st.n_bigrams,
       st.n_distinct,
       CAST((1000 * n_distinct) // n_bigrams AS BIGINT)
         AS distinct_permille
FROM st JOIN nr USING (prompt_key)""",
        "repeat_collapse": f"""{b},
aug AS (
  SELECT conv_id, CAST(turn_idx * 4 + r AS INT) AS turn_idx, text
  FROM exp CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) u
  WHERE (CAST(substr(conv_id, 6) AS INT) % 3 = 0 AND role = 'system')
     OR r = 0),
rn AS (
  SELECT conv_id, turn_idx, text,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
       - row_number() OVER (PARTITION BY conv_id, text
                            ORDER BY turn_idx) AS g
  FROM aug)
SELECT conv_id, CAST(min(turn_idx) AS INT) AS first_turn,
       CAST(max(turn_idx) AS INT) AS last_turn,
       CAST(count(*) AS BIGINT) AS n_repeats, text
FROM rn GROUP BY conv_id, text, g""",
        "log_templates": f"""{b},
tpl AS (
  SELECT regexp_replace(text, '[0-9]+', '<n>', 'g') AS template, text
  FROM exp),
ag AS (
  SELECT template, CAST(count(*) AS BIGINT) AS n_lines,
         min(text) AS example
  FROM tpl GROUP BY 1)
SELECT template, n_lines, example FROM ag
ORDER BY n_lines DESC, template LIMIT 50""",
        "length_histogram": """
SELECT CAST(CASE WHEN n_chars <= 0 THEN -1
            ELSE length(bin(CAST(n_chars AS BIGINT))) - 1 END AS INT)
         AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(n_chars) AS BIGINT) AS min_v,
       CAST(max(n_chars) AS BIGINT) AS max_v
FROM documents GROUP BY 1""",
        "hourly_forecast": """WITH hc AS MATERIALIZED (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS actual
  FROM events GROUP BY 1, 2)
SELECT a.event_type AS event_type, a.hour AS hour, a.actual AS actual,
       p.actual AS forecast,
       CAST(abs(a.actual - p.actual) AS BIGINT) AS abs_err
FROM hc a JOIN hc p
  ON p.event_type = a.event_type
 AND p.hour + INTERVAL 24 HOURS = a.hour""",
        "retention": """WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
ch AS (SELECT user_id, min(d) AS c FROM ud GROUP BY 1)
SELECT strftime(ch.c, '%Y-%m-%d') AS cohort_day,
       CAST(datediff('day', ch.c, ud.d) AS INT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM ud JOIN ch USING (user_id) GROUP BY 1, 2""",
        "funnel": """WITH f0 AS MATERIALIZED (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1),
f1 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN f0 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > f0.t GROUP BY 1),
f2 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN f1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > f1.t GROUP BY 1),
f3 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN f2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > f2.t GROUP BY 1)
SELECT CAST(0 AS INT) AS step_idx, 'signup' AS step,
       CAST(count(*) AS BIGINT) AS n_users FROM f0
UNION ALL SELECT CAST(1 AS INT), 'view', CAST(count(*) AS BIGINT) FROM f1
UNION ALL SELECT CAST(2 AS INT), 'click', CAST(count(*) AS BIGINT) FROM f2
UNION ALL SELECT CAST(3 AS INT), 'purchase', CAST(count(*) AS BIGINT)
FROM f3""",
        "dsir_weights": """WITH toks AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
         t.tok AS tok
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''),
dt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
v AS (SELECT tok, CAST(sum(is_t) AS BIGINT) AS ct,
             count(*) AS cr FROM toks GROUP BY 1),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr,
               count(*) AS vn FROM v),
r AS (SELECT tok,
  CAST(floor(CAST((ct + 1) * ((SELECT tr FROM tot) + (SELECT vn FROM tot))
                  AS DOUBLE)
             / ((cr + 1) * ((SELECT tt FROM tot) + (SELECT vn FROM tot)))
             * 1000000 + 0.5) AS BIGINT) AS sr
  FROM v)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
       CAST(sum(c * sr) AS BIGINT) AS weight_x1e6
FROM dt JOIN r USING (tok) GROUP BY doc_id""",
        "tfidf_topk": """WITH w AS (
  SELECT doc_id, t.tok AS tok FROM documents,
         unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM w GROUP BY 1, 2),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT doc_id, tok, tf, df,
             CAST(tf AS DOUBLE) * (SELECT n FROM n) / df AS score
      FROM tf JOIN df USING (tok)),
r AS (SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, tok) AS rank FROM s)
SELECT doc_id, CAST(rank AS INT) AS rank, tok,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM r WHERE rank <= 5""",
        "gopher_quality": """WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), w -> w <> '') AS words,
         string_split(text, chr(10)) AS lines
  FROM documents),
m AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0)
         AS BIGINT) AS word_chars,
    CAST((length(text) - length(replace(text, '#', '')))
         + (length(text) - length(replace(text, '...', ''))) // 3
         AS BIGINT) AS n_symbols,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(list_filter(lines,
         l -> substring(l, 1, 1) IN ('-', '*', '•'))) AS BIGINT) AS n_bullet,
    CAST(len(list_filter(lines, l -> l LIKE '%...')) AS BIGINT) AS n_ell,
    CAST(len(list_filter(words,
         w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
    (CASE WHEN list_contains(words, 'the') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(words, 'be') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(words, 'to') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(words, 'of') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(words, 'and') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(words, 'that') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(words, 'have') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(words, 'with') THEN 1 ELSE 0 END
    ) AS n_stop
  FROM base),
f AS (
  SELECT doc_id, n_words,
    CAST(n_words BETWEEN 50 AND 100000 AS INT) AS flag_word_count,
    CAST(word_chars >= 3 * n_words
         AND word_chars <= 10 * n_words AS INT) AS flag_mean_word_len,
    CAST(10 * n_symbols < n_words AS INT) AS flag_symbol_ratio,
    CAST(10 * n_bullet < 9 * n_lines AS INT) AS flag_bullet_lines,
    CAST(10 * n_ell < 3 * n_lines AS INT) AS flag_ellipsis_lines,
    CAST(10 * n_alpha >= 8 * n_words AS INT) AS flag_alpha_words,
    CAST(n_stop >= 2 AS INT) AS flag_stop_words
  FROM m)
SELECT *, CAST(flag_word_count * flag_mean_word_len * flag_symbol_ratio
       * flag_bullet_lines * flag_ellipsis_lines * flag_alpha_words
       * flag_stop_words AS INT) AS keep
FROM f""",
        "bpe_pairs": """WITH tok AS (
  SELECT t.tok AS tok FROM documents,
         unnest(string_split(text, ' ')) AS t(tok)
  WHERE length(t.tok) > 0),
wc AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
pairs AS (
  SELECT substring(tok, i.i, 2) AS pair, cnt
  FROM wc, unnest(range(1, length(tok))) AS i(i)
  WHERE length(tok) >= 2)
SELECT pair, CAST(sum(cnt) AS BIGINT) AS n FROM pairs GROUP BY pair""",
        "vocab_topk": """WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c) AS T FROM freq),
top AS (SELECT tok, c FROM freq ORDER BY c DESC, tok LIMIT 50)
SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS INT) AS rank,
       tok, CAST(c AS BIGINT) AS count,
       CAST((1000 * sum(c) OVER (ORDER BY c DESC, tok ROWS UNBOUNDED PRECEDING))
            // (SELECT T FROM tot) AS BIGINT) AS cum_permille
FROM top""",
        "shard_assign": f"""WITH h AS (
  SELECT doc_id,
         ({_hex13_sql("CAST(doc_id AS VARCHAR) || '#s4'")}) AS hv
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(hv % 16 AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY hv % 16 ORDER BY hv, doc_id) AS BIGINT) AS pos
FROM h""",
        "simhash": f"""WITH
tok AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
hh AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM tok),
pos AS (SELECT doc_id, unnest(generate_series(1, 16)) AS p, h FROM hh),
nibv AS (SELECT doc_id, p, ({_NIB_CASE}) AS v FROM pos),
sums AS (SELECT doc_id, p,
  sum(CASE WHEN (v & 1) > 0 THEN 1 ELSE -1 END) AS s0,
  sum(CASE WHEN (v & 2) > 0 THEN 1 ELSE -1 END) AS s1,
  sum(CASE WHEN (v & 4) > 0 THEN 1 ELSE -1 END) AS s2,
  sum(CASE WHEN (v & 8) > 0 THEN 1 ELSE -1 END) AS s3
  FROM nibv GROUP BY 1, 2),
nib AS (SELECT doc_id, p,
  (CASE WHEN s0 > 0 THEN 1 ELSE 0 END) + (CASE WHEN s1 > 0 THEN 2 ELSE 0 END)
  + (CASE WHEN s2 > 0 THEN 4 ELSE 0 END) + (CASE WHEN s3 > 0 THEN 8 ELSE 0 END) AS nv
  FROM sums),
hx AS (SELECT doc_id, p, ({_HEX_CASE}) AS hexc FROM nib)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       string_agg(hexc, '' ORDER BY p) AS simhash_hex
FROM hx GROUP BY doc_id""",
        "ann_cosine_topk": f"""WITH {_ANN_NORM_CTE},
s AS (SELECT probe_id, n.vec_id AS nbr_id,
        round({_DOT} / (pn * n.nrm), 4) AS cosine
      FROM p, n WHERE n.vec_id <> probe_id),
r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, nbr_id) AS rank FROM s)
SELECT CAST(probe_id AS BIGINT) AS probe_id, CAST(nbr_id AS BIGINT) AS nbr_id,
       cosine, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 5""",
        "ann_ivf_topk": f"""WITH {_ANN_NORM_CTE},
sd AS (SELECT vec_id AS seed_id, embedding AS sv, nrm AS snorm FROM n WHERE vec_id < (SELECT greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM n)),
sc AS (SELECT n.vec_id, n.embedding, n.nrm, sd.seed_id,
        list_sum(list_transform(list_zip(n.embedding, sd.sv),
              t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))) / sd.snorm AS sscore
       FROM n CROSS JOIN sd),
rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sscore DESC, seed_id) AS rn FROM sc),
bkt AS (SELECT vec_id, embedding, nrm, seed_id AS bucket FROM rk WHERE rn = 1),
pe AS (SELECT vec_id AS probe_id, embedding AS pv, nrm AS pn, seed_id AS qbucket
       FROM rk WHERE vec_id < 10 AND rn <= (SELECT CAST(ceil(3.0 * greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) / 16) AS BIGINT) FROM n)),
s AS (SELECT probe_id, b.vec_id AS nbr_id,
        round(list_sum(list_transform(list_zip(pv, b.embedding),
              t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))) / (pn * b.nrm), 4) AS cosine
      FROM pe JOIN bkt b ON b.bucket = qbucket AND b.vec_id <> probe_id),
r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, nbr_id) AS rank FROM s)
SELECT CAST(probe_id AS BIGINT) AS probe_id, CAST(nbr_id AS BIGINT) AS nbr_id,
       cosine, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 5""",
        "dedup_embedding": """WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000,
         list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT))
  FROM embeddings WHERE vec_id % 25 = 0),
n AS (SELECT vec_id, embedding,
  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM aug),
sd AS (SELECT vec_id AS seed_id, embedding AS sv, nrm AS snorm FROM n WHERE vec_id < (SELECT greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM n)),
sc AS (SELECT n.vec_id, n.embedding, n.nrm, sd.seed_id,
        list_sum(list_transform(list_zip(n.embedding, sd.sv),
              t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))) / sd.snorm AS sscore
       FROM n CROSS JOIN sd),
rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sscore DESC, seed_id) AS rn FROM sc),
bkt AS (SELECT vec_id, embedding, nrm, seed_id AS bucket FROM rk WHERE rn <= 2),
s AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
              t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))) / (a.nrm * b.nrm), 4) AS cosine
      FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT CAST(vec_a AS BIGINT) AS vec_a, CAST(vec_b AS BIGINT) AS vec_b,
       max(cosine) AS cosine
FROM s WHERE cosine >= 0.98 GROUP BY 1, 2""",
        "contamination": """WITH
bench AS (
  SELECT doc_id,
         text || CASE WHEN doc_id = 0
                      THEN ' leak marker phrase alpha beta gamma delta epsilon'
                      ELSE '' END AS text
  FROM documents WHERE doc_id % 47 = 0),
train AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 31 = 1
                      THEN ' leak marker phrase alpha beta gamma delta epsilon'
                      ELSE '' END AS text
  FROM documents WHERE doc_id % 47 <> 0),
bw AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM bench),
bx AS (SELECT unnest(generate_series(1, greatest(len(ws) - 4, 0))) AS i, ws FROM bw),
bg AS (SELECT DISTINCT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
              || ws[i+3] || ' ' || ws[i+4] AS gram FROM bx),
tw AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM train),
tx AS (SELECT doc_id, unnest(generate_series(1, greatest(len(ws) - 4, 0))) AS i, ws FROM tw),
tg AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
              || ws[i+3] || ' ' || ws[i+4] AS gram FROM tx)
SELECT CAST(tg.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS INT) AS n_overlaps,
       MIN(tg.gram) AS example_gram
FROM tg JOIN bg ON bg.gram = tg.gram
GROUP BY 1""",
        "pii_redact": r"""WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com from 10.0.'
              || CAST(doc_id % 256 AS VARCHAR)
              || '.17 ref 4111111111111111' AS text
  FROM documents),
r AS (
  SELECT doc_id, text,
         regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS c2
  FROM aug)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       regexp_replace(c2, '\d{8,}', '<NUM>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(c2, '\d{8,}')) AS INT) AS n_longnums
FROM r""",
        "domain_profile": """WITH aug AS (
  SELECT doc_id,
         text || ' see https://site' || CAST(doc_id % 13 AS VARCHAR)
              || '.example.org/p' || CAST(doc_id AS VARCHAR)
              || CASE WHEN doc_id % 4 = 1
                      THEN ' and http://cdn' || CAST(doc_id % 7 AS VARCHAR)
                           || '.example.net/asset'
                      ELSE '' END AS text
  FROM documents),
cites AS (
  SELECT doc_id, unnest(regexp_extract_all(text,
         'https?://([A-Za-z0-9.-]+)', 1)) AS domain
  FROM aug)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CASE WHEN domain IN ('site0.example.org', 'site5.example.org',
                            'cdn3.example.net', 'evil.example.com')
            THEN 1 ELSE 0 END AS blocked
FROM cites GROUP BY 1""",
        "winnow": f"""WITH tw AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(ws) - 4, 0))) AS i, ws
  FROM tw),
gr AS (
  SELECT doc_id, i, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
         || ws[i+3] || ' ' || ws[i+4] AS gram
  FROM g),
gh AS (
  SELECT doc_id, i - 1 AS pos,
         (({_hex13_sql('gram')}) % 1099511627776) * 4194304
           + (2097151 - (i - 1)) AS packed
  FROM gr),
sel AS (
  SELECT doc_id, pos,
         min(packed) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS n_h
  FROM gh)
SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(2097151 - (wmin % 4194304) AS INT) AS fp_pos,
       CAST(wmin // 4194304 AS BIGINT) AS fp_hash
FROM sel
WHERE pos <= n_h - 4 OR (n_h < 4 AND pos = 0)""",
        "dedup_incremental": f"""WITH
base AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
inc AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 30 = 0 THEN coalesce(n1.text, d.text)
              WHEN d.doc_id % 30 = 15 THEN coalesce(n2.text || ' zzextra', d.text)
              ELSE d.text END AS text
  FROM documents d
  LEFT JOIN documents n1 ON n1.doc_id = d.doc_id + 1
  LEFT JOIN documents n2 ON n2.doc_id = d.doc_id + 2
  WHERE d.doc_id % 3 = 0),
bi AS (SELECT md5(text) AS digest, min(doc_id) AS base_doc_id FROM base GROUP BY 1),
ex AS (SELECT i.doc_id, bi.base_doc_id FROM inc i LEFT JOIN bi ON bi.digest = md5(i.text)),
bw AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM base),
bx AS (SELECT doc_id, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i, ws FROM bw),
bsh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle FROM bx),
bsig AS (SELECT doc_id, {minhash_sig} FROM bsh GROUP BY doc_id),
bband AS (SELECT DISTINCT band, bval FROM (
  SELECT 0 AS band, md5(m0 || m1 || m2 || m3) AS bval FROM bsig
  UNION ALL
  SELECT 1 AS band, md5(m4 || m5 || m6 || m7) AS bval FROM bsig) t),
iw AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM inc),
ix AS (SELECT doc_id, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i, ws FROM iw),
ish AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle FROM ix),
isig AS (SELECT doc_id, {minhash_sig} FROM ish GROUP BY doc_id),
iband AS (
  SELECT doc_id, 0 AS band, md5(m0 || m1 || m2 || m3) AS bval FROM isig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(m4 || m5 || m6 || m7) AS bval FROM isig),
nb AS (SELECT i.doc_id, count(*) AS n_band_hits
       FROM iband i JOIN bband b ON b.band = i.band AND b.bval = i.bval
       GROUP BY 1)
SELECT CAST(ex.doc_id AS BIGINT) AS doc_id,
       CASE WHEN ex.base_doc_id IS NOT NULL THEN 'exact'
            WHEN nb.doc_id IS NOT NULL THEN 'near'
            ELSE 'new' END AS status,
       CAST(ex.base_doc_id AS BIGINT) AS base_doc_id,
       CAST(COALESCE(nb.n_band_hits, 0) AS INT) AS n_band_hits
FROM ex LEFT JOIN nb ON nb.doc_id = ex.doc_id""",
        "dup_spans": """WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 2
                 THEN ' this message was generated by the automated export pipeline and must be ignored by the training run'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 7
                 THEN ' copyright notice all rights reserved worldwide second edition printing'
                 ELSE '' END AS text
  FROM documents),
tw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM aug),
tok AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, ws FROM tw),
tok2 AS (SELECT doc_id, pos, ws[pos] AS tok FROM tok),
grams AS (
  SELECT doc_id, pos,
         ws[pos] || ' ' || ws[pos+1] || ' ' || ws[pos+2] || ' ' || ws[pos+3]
         || ' ' || ws[pos+4] || ' ' || ws[pos+5] || ' ' || ws[pos+6]
         || ' ' || ws[pos+7] AS gram
  FROM tok WHERE pos <= len(ws) - 7),
dup AS (SELECT gram FROM grams GROUP BY 1 HAVING count(*) > 1),
starts AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
cov AS (SELECT DISTINCT doc_id, pos + j.j AS cpos
        FROM starts, (SELECT unnest(generate_series(0, 7)) AS j) j),
isl AS (SELECT doc_id, cpos,
               cpos - row_number() OVER (PARTITION BY doc_id ORDER BY cpos) AS island
        FROM cov),
cstats AS (SELECT doc_id, count(*) AS n_dup_tokens,
                  count(DISTINCT island) AS n_spans FROM isl GROUP BY 1),
clean AS (SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text
          FROM tok2 t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.cpos = t.pos
          WHERE c.doc_id IS NULL GROUP BY 1),
base AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM aug)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(b.n_tokens AS INT) AS n_tokens,
       CAST(COALESCE(s.n_dup_tokens, 0) AS INT) AS n_dup_tokens,
       CAST((1000 * COALESCE(s.n_dup_tokens, 0)) // b.n_tokens AS INT) AS dup_permille,
       CAST(COALESCE(s.n_spans, 0) AS INT) AS n_spans,
       COALESCE(c.clean_text, '') AS clean_text
FROM base b LEFT JOIN cstats s USING (doc_id) LEFT JOIN clean c USING (doc_id)""",
        "pack_sequences": """WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         CAST(COALESCE(SUM(toks) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_tok
  FROM d),
e AS (
  SELECT doc_id, toks, start_tok,
         unnest(range(start_tok // 2048,
                      (start_tok + toks - 1) // 2048 + 1)) AS pack_id
  FROM c)
SELECT CAST(pack_id AS BIGINT) AS pack_id,
       CAST(count(*) AS INT) AS n_docs,
       CAST(SUM(LEAST(start_tok + toks, (pack_id + 1) * 2048)
                - GREATEST(start_tok, pack_id * 2048)) AS BIGINT)
         AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM e GROUP BY 1""",
        "dedup_semantic": """WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000,
         list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT))
  FROM embeddings WHERE vec_id % 25 = 0),
n AS (SELECT vec_id, embedding,
  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM aug),
sd AS (SELECT vec_id AS seed_id, embedding AS sv, nrm AS snorm FROM n WHERE vec_id < (SELECT greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM n)),
sc AS (SELECT n.vec_id, n.embedding, n.nrm, sd.seed_id,
        list_sum(list_transform(list_zip(n.embedding, sd.sv),
              t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))) / sd.snorm AS sscore
       FROM n CROSS JOIN sd),
rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sscore DESC, seed_id) AS rn FROM sc),
cells AS (SELECT vec_id, embedding, nrm, seed_id AS cell FROM rk WHERE rn = 1),
reps AS (SELECT cell, MIN(vec_id) AS rep_id FROM cells GROUP BY 1),
rv AS (SELECT r.cell, r.rep_id, c.embedding AS rvv, c.nrm AS rnrm
       FROM reps r JOIN cells c ON c.vec_id = r.rep_id),
j AS (SELECT c.vec_id, c.cell, rv.rep_id,
        round(list_sum(list_transform(list_zip(c.embedding, rv.rvv),
              t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))
              / (c.nrm * rv.rnrm), 4) AS cos_to_rep
      FROM cells c JOIN rv ON rv.cell = c.cell)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(cell AS BIGINT) AS cell,
       CAST(rep_id AS BIGINT) AS rep_id,
       cos_to_rep,
       (vec_id = rep_id OR cos_to_rep < 0.95) AS keep
FROM j""",
        "text_tokens": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS re_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents""",
        "text_quality": f"""WITH q AS (
  SELECT doc_id, text,
         string_split(lower(text), ' ') AS words,
         len(string_split(lower(text), ' ')) AS n_words,
         len(list_filter(list_distinct(string_split(lower(text), ' ')),
             w -> w IN {_STOPS})) AS n_stop,
         len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS punct
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(n_stop / n_words, 4) AS stop_ratio,
       round(punct / length(text), 4) AS punct_ratio,
       round(length(replace(text, ' ', '')) / n_words, 4) AS mean_word_len,
       CAST(floor(((n_stop / n_words) * 2.0 - (punct / length(text))
             + least(length(text) / 500.0, 1.0)) * 10000 + 0.5) AS BIGINT) AS quality_x10k
FROM q""",
        "lang_id": f"""WITH q AS (
  SELECT doc_id, lang,
         len(list_filter(list_distinct(string_split(lower(text), ' ')),
             w -> w IN {_STOPS}))
         / len(string_split(lower(text), ' ')) AS density
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS lang_declared,
       round(density, 4) AS en_density,
       CASE WHEN density > 0.02 THEN 'en' ELSE 'other' END AS lang_guess
FROM q""",
        "doc_fingerprint": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS content_fp,
       md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS bow_fp
FROM documents""",
        "multimodal_meta": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
       'text' AS modality
FROM documents""",
        "multimodal_frames": """
WITH f AS (
  SELECT doc_id,
         lower(hex(encode(text))) AS hx,
         least(8, CAST(ceil(octet_length(encode(text)) / 16.0) AS INT)) AS k
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(k AS INT) AS n_frames,
       array_to_string(
         list_transform(generate_series(0, k - 1),
                        i -> substr(hx, i * 32 + 1, 2)), ':') AS frames
FROM f""",
        "length_quantiles": """WITH
freq AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
cum AS (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum FROM freq),
tot AS (SELECT count(*) AS n FROM documents),
qs AS (SELECT unnest([500, 900, 990]) AS q_permille),
r AS (SELECT q_permille, (q_permille * n + 999) // 1000 AS k FROM qs, tot)
SELECT CAST(q_permille AS INT) AS q_permille,
       CAST(k AS BIGINT) AS k,
       CAST(min(CASE WHEN cum >= k THEN v END) AS INT) AS value
FROM r, cum GROUP BY q_permille, k""",
        "bloom_prefilter": f"""WITH ks AS (
  SELECT text FROM documents WHERE doc_id % 10 = 0),
pos AS (SELECT DISTINCT
          CAST(({_hex13_sql("CAST(j AS VARCHAR) || ':' || text")}) % 512 AS INT) AS pos
        FROM ks CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) u),
cd AS (SELECT doc_id, j,
          CAST(({_hex13_sql("CAST(j AS VARCHAR) || ':' || text")}) % 512 AS INT) AS pos
       FROM documents CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) u),
hit AS (SELECT doc_id, count(*) AS nh FROM cd JOIN pos USING (pos) GROUP BY 1),
ex AS (SELECT DISTINCT d.doc_id FROM documents d JOIN ks ON d.text = ks.text)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       COALESCE(h.nh >= 4, FALSE) AS bloom_pass,
       (e.doc_id IS NOT NULL) AS exact,
       (COALESCE(h.nh >= 4, FALSE) AND e.doc_id IS NULL) AS false_positive
FROM documents d LEFT JOIN hit h USING (doc_id) LEFT JOIN ex e USING (doc_id)""",
        "rate_anomalies": f"""{b},
hh AS (SELECT sink_eff AS sink, date_trunc('hour', ts_eff) AS hour,
              CAST(count(*) AS BIGINT) AS n_rows
       FROM asm WHERE ts_eff IS NOT NULL GROUP BY 1, 2),
rk AS (SELECT *, row_number() OVER (PARTITION BY sink ORDER BY n_rows, hour) AS rn,
              count(*) OVER (PARTITION BY sink) AS n
       FROM hh),
md AS (SELECT sink, n_rows AS median_rows FROM rk WHERE rn = (n + 1) // 2)
SELECT h.sink AS sink, h.hour AS hour, h.n_rows AS n_rows,
       CAST(m.median_rows AS BIGINT) AS median_rows,
       (h.n_rows * 1000 > 3000 * m.median_rows) AS is_anomaly
FROM hh h JOIN md m USING (sink)""",
        "zorder_key": f"""{b},
d AS (SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx,
             CAST(turn_idx AS BIGINT) AS x,
             CAST(substr(conv_id, 6) AS BIGINT) % 65536 AS y
      FROM exp),
z AS (SELECT conv_id, turn_idx, CAST({_morton_sql(16)} AS BIGINT) AS zkey FROM d)
SELECT conv_id, turn_idx, zkey, CAST(zkey >> 26 AS INT) AS zbucket FROM z""",
        "inverted_index": """WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
tk AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS i, ws FROM w),
tok AS (SELECT doc_id, i - 1 AS pos, ws[i] AS token FROM tk WHERE ws[i] <> ''),
ag AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR), ','
                  ORDER BY doc_id, pos) AS p
       FROM tok GROUP BY 1)
SELECT token, df, CASE WHEN df <= 64 THEN p END AS postings FROM ag""",
        "response_latency": f"""{b},
f AS (
  SELECT conv_id, turn_idx, role, ts,
    min(CASE WHEN role = 'assistant' THEN turn_idx END) OVER w AS asst_idx,
    min(CASE WHEN role = 'user' THEN turn_idx END) OVER w AS next_user_idx,
    min_by(CASE WHEN role = 'assistant' THEN ts END,
           CASE WHEN role = 'assistant' THEN turn_idx END) OVER w AS asst_ts
  FROM exp
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
lat AS (
  SELECT CAST((epoch_us(asst_ts) - epoch_us(ts)) // 1000000 AS BIGINT) AS v
  FROM f
  WHERE role = 'user' AND asst_idx IS NOT NULL
    AND (next_user_idx IS NULL OR asst_idx < next_user_idx)),
freq AS (SELECT v, count(*) AS c FROM lat GROUP BY 1),
cum AS (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum FROM freq),
tot AS (SELECT count(*) AS n FROM lat),
qs AS (SELECT unnest([500, 900, 990]) AS q_permille),
r AS (SELECT q_permille, (q_permille * n + 999) // 1000 AS k FROM qs, tot)
SELECT CAST(q_permille AS INT) AS q_permille,
       CAST(k AS BIGINT) AS k,
       CAST(min(CASE WHEN cum >= k THEN v END) AS BIGINT) AS value
FROM r, cum GROUP BY q_permille, k""",
        "hourly_uniques": _hourly_uniques_sql(),
        "snapshot_apply": """WITH up AS MATERIALIZED (
  SELECT doc_id, text || ' v2' AS text FROM documents
  WHERE doc_id % 13 <> 0 AND doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 100000, 'new doc ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 11 = 0),
dead AS MATERIALIZED (
  SELECT doc_id FROM up
  UNION SELECT doc_id FROM documents WHERE doc_id % 13 = 0)
SELECT CAST(doc_id AS BIGINT) AS doc_id, text, 'kept' AS op
FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dead)
UNION ALL
SELECT CAST(doc_id AS BIGINT), text, 'upserted' FROM up""",
        "corpus_diff": """WITH o AS (
  SELECT doc_id, md5(text) AS od FROM documents),
nw AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS nd
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 100000, md5('new doc ' || CAST(doc_id AS VARCHAR))
  FROM documents WHERE doc_id % 11 = 0),
j AS (SELECT COALESCE(o.doc_id, nw.doc_id) AS doc_id, od, nd
      FROM o FULL OUTER JOIN nw ON o.doc_id = nw.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN nd IS NULL THEN 'removed'
            WHEN od IS NULL THEN 'added'
            WHEN od <> nd THEN 'changed'
            ELSE 'unchanged' END AS status
FROM j""",
        "json_props": """WITH t AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(k) AS BIGINT) AS with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM t GROUP BY 1""",
        "streaming_cms": f"""{b},
tok AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM exp),
cj AS (SELECT token, unnest([0, 1, 2, 3]) AS j FROM tok)
SELECT CAST(j AS INT) AS j,
       CAST(({_hex13_sql("CAST(j AS VARCHAR) || ':' || token")}) % 1024
            AS INT) AS cell,
       CAST(count(*) AS BIGINT) AS c
FROM cj GROUP BY 1, 2""",
        "streaming_hll": f"""{b},
h AS (SELECT ({_hex13_sql("text")}) AS hv FROM exp)
SELECT CAST(hv % 256 AS INT) AS bucket,
       CAST(max(CASE WHEN hv // 256 = 0 THEN 45
                ELSE 45 - length(bin(hv // 256)) END) AS INT) AS maxrho
FROM h GROUP BY 1""",
        "cms_heavy_hitters": f"""WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
vc AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
cj AS (SELECT token, cnt, j,
       CAST(({_hex13_sql("CAST(j AS VARCHAR) || ':' || token")}) % 1024 AS INT) AS cell
       FROM vc CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) u),
cells AS (SELECT j, cell, CAST(sum(cnt) AS BIGINT) AS c
          FROM cj GROUP BY 1, 2),
est AS (SELECT cj.token AS token, cj.cnt AS cnt,
               CAST(min(c) AS BIGINT) AS est
        FROM cj JOIN cells USING (j, cell) GROUP BY 1, 2),
thr AS (SELECT CAST(sum(cnt) // 500 AS BIGINT) AS thr FROM vc)
SELECT token, cnt, est FROM est, thr WHERE est >= thr""",
        "hll_distinct": f"""{b},
tok AS (SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
SELECT * FROM {_hll_sql("tok", "doc_tokens", "t")}
UNION ALL
SELECT * FROM {_hll_sql("exp", "turn_texts", "text")}""",
        "distinct_kmv": f"""WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
h AS (SELECT DISTINCT {_hex13_sql('t')} AS hv FROM tok),
mins AS (SELECT hv FROM h ORDER BY hv LIMIT 256)
SELECT CAST(count(*) AS BIGINT) AS k_used,
       CAST(CASE WHEN count(*) < 256 THEN count(*)
            ELSE {255 * 16**13} // max(hv) END AS BIGINT) AS est_distinct
FROM mins""",
        "stratified_sample": f"""WITH s AS (
  SELECT * FROM documents
  WHERE ({_hex13_sql('CAST(doc_id AS VARCHAR)')}) % 100 < 10)
SELECT lang, CAST(count(*) AS BIGINT) AS rows,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM s GROUP BY lang""",
        "group_split": f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CASE ({_hex13_sql("source || '#split1'")}) % 10
            WHEN 8 THEN 'val' WHEN 9 THEN 'test'
            ELSE 'train' END AS split
FROM documents""",
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2""",
        "tpch_q3": """
SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey, o.o_orderdate, o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY 1, 2, 3""",
    }

"""Raw log-file source: the reference's actual input shape.

s4 walks paths, routes by file type (text/gz/bz2/…,
src/readers/filepreprocessor.rs:1462,1188), splits files into lines
(src/readers/linereader.rs) and assembles syslines.  Spark equivalents:

 * path walk           → spark.read glob expansion
 * gz/bz2 codecs       → built-in text-source codec handling
 * per-file identity   → input_file_name()
 * line splitting      → text source (one row per line)
 * line numbers        → per-file window over the text source's
                         preserved intra-file order

After this source, rows have exactly the transcripts shape
(conv_id=file, turn_idx=line number, text=line, ts=file mtime
stand-in), so the entire pipeline (parse → repair → assemble →
merge) runs unchanged on real log files — `s4 <paths>` parity.
"""

from __future__ import annotations

import codecs
import glob as _glob
import gzip
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# BOM sniff table, longest first (UTF-32LE's BOM starts with
# UTF-16LE's) — detect_filetype_text_encoding parity
# (src/readers/filepreprocessor.rs:278-360).
_BOM_ENCODINGS = [
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
]


def sniff_encoding(head: bytes) -> str:
    """Encoding detection: BOM first, then null-byte-pattern scoring
    for BOM-less UTF-16/32 (filepreprocessor.rs:278-360 scores the
    first block's byte layout the same way); defaults to UTF-8.

    ASCII-range text encoded UTF-16LE looks like ``41 00 42 00`` (odd
    bytes null), BE like ``00 41``; UTF-32 adds three nulls per
    4-byte group.  Thresholds ask for >80% conformity over at least 8
    bytes so binary junk stays 'utf-8' (and downstream replacement
    decoding applies)."""
    for bom, enc in _BOM_ENCODINGS:
        if head.startswith(bom):
            return enc
    n = len(head) & ~3  # whole 4-byte groups
    if n >= 8:
        g = [head[i : i + 4] for i in range(0, n, 4)]
        if sum(b[1:] == b"\x00\x00\x00" and b[0] != 0 for b in g) > 0.8 * len(g):
            return "utf-32-le"
        if sum(b[:3] == b"\x00\x00\x00" and b[3] != 0 for b in g) > 0.8 * len(g):
            return "utf-32-be"
        pairs = [head[i : i + 2] for i in range(0, n, 2)]
        if sum(p[1] == 0 and p[0] != 0 for p in pairs) > 0.8 * len(pairs):
            return "utf-16-le"
        if sum(p[0] == 0 and p[1] != 0 for p in pairs) > 0.8 * len(pairs):
            return "utf-16-be"
    return "utf-8"


def read_log_files(
    spark: SparkSession, paths: list[str] | str, mtime_map: dict | None = None
) -> DataFrame:
    """paths (files/globs; .gz/.bz2 transparently decompressed) →
    DataFrame(conv_id, turn_idx, role, text, tool, ts).

    ts carries the file mtime (s4 seeds no-year formats and uptime
    anchors from mtime, src/readers/syslogprocessor.rs:628,740); pass
    mtime_map={path: datetime} to override (tests / object stores).

    Line numbering: the text source emits rows in file order within
    each split; for exact global per-file numbering we order by the
    block-offset-monotonic ``monotonically_increasing_id()`` inside
    the per-file window — correct while each file maps to one split
    (true for gz — non-splittable — and for text files below
    maxPartitionBytes; larger splittable files should come in via the
    transcripts table instead).
    """
    if isinstance(paths, str):
        paths = [paths]
    df = (
        spark.read.text(paths)
        .withColumn("conv_id", F.input_file_name())
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("conv_id").orderBy("_mid")
    out = (
        df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumnRenamed("value", "text")
        .drop("_mid")
    )
    if mtime_map:
        mt = F.create_map(
            *[
                x
                for path, ts in mtime_map.items()
                for x in (F.lit(path), F.lit(ts))
            ]
        )
        ts_col = mt[F.col("conv_id")].cast("timestamp")
    else:
        local = {}
        # expand globs and build keys exactly as input_file_name()
        # prints them (percent-encoded file:// URIs via Path.as_uri),
        # so paths with spaces/unicode still resolve their mtime
        for p in paths:
            for g in _glob.glob(p) or ([p] if os.path.isfile(p) else []):
                if os.path.isfile(g):
                    local[Path(g).resolve().as_uri()] = int(
                        os.path.getmtime(g)
                    )
        if local:
            mt = F.create_map(
                *[
                    x
                    for path, ts in local.items()
                    for x in (F.lit(path), F.lit(ts))
                ]
            )
            ts_col = F.timestamp_seconds(mt[F.col("conv_id")])
        else:
            ts_col = F.lit(None).cast("timestamp")
    return out.select(
        "conv_id",
        "turn_idx",
        F.lit("log").alias("role"),
        "text",
        F.lit("none").alias("tool"),
        ts_col.alias("ts"),
    )


def _decompress(path: str, data: bytes) -> bytes:
    """Per-codec whole-file decompression by extension — BlockReader
    codec parity (blockreader.rs:3382 bz2, :3959 lz4, :4155 xz; gz
    handled by its own reader).  lz4 prefers the C-backed ``lz4``
    package when importable and otherwise uses the dependency-free
    pure-Python frame decoder (functions/lz4frame, written from the
    public LZ4 spec; validated against the reference corpus's real
    .lz4 files)."""
    if path.endswith(".gz"):
        return gzip.decompress(data)
    if path.endswith(".bz2"):
        import bz2

        return bz2.decompress(data)
    if path.endswith((".xz", ".lzma")):
        import lzma

        return lzma.decompress(data)
    if path.endswith(".lz4"):
        try:
            import lz4.frame  # optional C-speed fast path
        except ImportError:
            from ..functions import lz4frame

            return lz4frame.decompress(data)
        return lz4.frame.decompress(data)
    return data


def hadoop_glob_escape(path: str) -> str:
    """Escape glob metacharacters in a LITERAL path for Hadoop's
    GlobFilter (binaryFile/text .load treat paths as glob patterns —
    a real file named 'entry6_1_(b1_xz).wtmp.tar' or 'a[4-0].log'
    otherwise errors or silently matches nothing)."""
    out = []
    for c in path:
        if c in '*?[]{}\\':
            out.append('\\' + c)
        else:
            out.append(c)
    return "".join(out)


def read_log_files_decoded(
    spark: SparkSession,
    paths: list[str] | str,
    charset: str | None = None,
) -> DataFrame:
    """Encoding-aware log-file source: UTF-8/16/32 ± BOM.

    The Spark text source is UTF-8-only, so non-UTF-8 files take the
    reference's own route (filepreprocessor.rs:278-360 detects BOM and
    transcodes the file): whole files via the binaryFile source, then
    an Arrow-batched mapInPandas decodes (BOM sniff unless charset is
    forced), splits lines, and numbers turns.  A file is the unit of
    parallelism — identical to s4's one-reader-per-file model; the
    binaryFile source never splits a file, so line numbering is exact.
    .gz payloads are decompressed before the sniff (BlockReader codec
    parity).  ts carries the file's modificationTime, the same mtime
    seed s4 uses for no-year/uptime anchoring.

    Output shape == read_log_files == transcripts: the whole pipeline
    runs unchanged on the result.
    """
    if isinstance(paths, str):
        paths = [paths]
    bf = spark.read.format("binaryFile").load(
        [hadoop_glob_escape(p) for p in paths]
    )
    return decode_text_binary_df(bf, charset=charset)


def decode_text_binary_df(
    bf: DataFrame, charset: str | None = None
) -> DataFrame:
    """The decode stage of ``read_log_files_decoded`` over an
    existing (path, modificationTime, content) DataFrame — lets tar
    member rows (``read_tar_members``) flow through the identical
    text pipeline as directly-loaded files."""
    import pandas as pd

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )

    import numpy as np

    def decode(batches):
        for pdf in batches:
            frames = []

            def emit(source, mtime, data):
                enc = charset or sniff_encoding(data[:64])
                # the explicit-endian codecs keep U+FEFF; drop the BOM
                # bytes so line 0 starts at the real text
                for bom, e in _BOM_ENCODINGS:
                    if e == enc and data.startswith(bom):
                        data = data[len(bom):]
                        break
                lines = data.decode(enc, errors="replace").splitlines()
                if not lines:
                    return
                # bulk per-file frame: one list→Series for the lines,
                # np.arange turn numbering, scalar broadcast for the
                # per-file constants — Python touches each FILE, not
                # each line (round-3 verdict item 5)
                frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": source,
                            "turn_idx": np.arange(
                                len(lines), dtype="int32"
                            ),
                            "role": "log",
                            "text": pd.Series(lines, dtype="object"),
                            "tool": "none",
                            "ts": mtime,
                        }
                    )
                )

            for path, mtime, content in zip(
                pdf["path"], pdf["modificationTime"], pdf["content"]
            ):
                # file-level fault isolation: ONE undecodable file
                # (missing codec lib, truncated archive, corrupt
                # stream) must never kill the job — s4 records a
                # per-file processing error and moves on
                # (syslogprocessor FileErr*; our --summary reports it
                # via the absent source)
                try:
                    # real filesystems carry ns mtimes; Spark
                    # timestamps are µs and the ns→µs Arrow cast is
                    # "unsafe" — truncate up front
                    if mtime is not None and not pd.isna(mtime):
                        mtime = pd.Timestamp(mtime).floor("us")
                    _decode_one(emit, path, mtime, content)
                except Exception as ex:  # noqa: BLE001
                    import sys as _sys

                    print(
                        f"WARNING: failed to decode {path!r}: "
                        f"{type(ex).__name__}: {ex}",
                        file=_sys.stderr,
                    )
                    continue
            if frames:
                yield pd.concat(frames, ignore_index=True)
            else:
                yield pd.DataFrame(
                    {
                        "conv_id": pd.Series(dtype="object"),
                        "turn_idx": pd.Series(dtype="int32"),
                        "role": pd.Series(dtype="object"),
                        "text": pd.Series(dtype="object"),
                        "tool": pd.Series(dtype="object"),
                        "ts": pd.Series(dtype="datetime64[ns]"),
                    }
                )

    def _decode_one(emit, path, mtime, content):
        if path.endswith((".tar", ".tar.gz", ".tgz")):
            # archive members become independent sources
            # ('file.tar!member', process_path_tar parity —
            # filepreprocessor.rs:1205; each member keeps its
            # own mtime like the reference's tar entries)
            import io
            import tarfile

            raw = bytes(content)
            if path.endswith((".tar.gz", ".tgz")):
                raw = gzip.decompress(raw)
            with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
                for m in tf.getmembers():
                    if not m.isfile():
                        continue
                    mdata = _decompress(
                        m.name, tf.extractfile(m).read()
                    )
                    emit(
                        f"{path}!{m.name}",
                        # member mtimes can be FLOAT seconds with an
                        # ns remainder (pax headers) — floor to µs and
                        # pin UTC so frames never mix naive/aware
                        pd.Timestamp(
                            m.mtime, unit="s", tz="UTC"
                        ).floor("us"),
                        mdata,
                    )
            return
        emit(path, mtime, _decompress(path, bytes(content)))

    return (
        bf.select("path", "modificationTime", "content")
        .mapInPandas(decode, schema)
    )


# ---------------------------------------------------------------- routing

# path_to_filetype parity (src/readers/filepreprocessor.rs:1188,1462):
# extension → reader family.  Unknown extensions route to the text
# reader (s4 attempts text parsing for unrecognized files).
_FIXEDSTRUCT_NAMES = ("utmp", "wtmp", "btmp", "utmpx", "wtmpx", "lastlog")


_COMPRESSION_EXTS = (".gz", ".bz2", ".xz", ".lzma", ".lz4")


def strip_compression(path: str) -> str:
    """Peel compression suffixes so routing sees the inner type
    ('system.journal.gz' routes as journal; s4 decompresses to a
    temp file first — decompress_to_ntf — then routes the result)."""
    low = path.lower()
    while low.endswith(_COMPRESSION_EXTS):
        low = low[: low.rfind(".")]
    return low


def path_to_filetype(path: str) -> str:
    """'tar' | 'evtx' | 'journal' | 'fixedstruct' | 'text'."""
    low = strip_compression(path)
    if low.endswith(".tar") or low.endswith(".tgz"):
        # archives route per-MEMBER (filepreprocessor.rs:1205-1260
        # routes each tar entry by its own inner type); the outer
        # 'tar' type tells assembled_from_paths to explode first
        return "tar"
    if low.endswith(".evtx"):
        return "evtx"
    if low.endswith(".journal"):
        return "journal"
    if low.endswith((".odl", ".odlgz", ".aodl", ".odlsent")):
        return "odl"
    if low.endswith(".asl"):
        return "asl"
    if low.endswith(".etl"):
        return "etl"
    base = low.rsplit("/", 1)[-1]
    stem = base.split(".")[0]
    if stem in _FIXEDSTRUCT_NAMES or base.endswith(
        tuple("." + n for n in _FIXEDSTRUCT_NAMES)
    ):
        return "fixedstruct"
    return "text"


def tar_member_types(path: str) -> set[str]:
    """Driver-side header scan of a local tar: the set of inner file
    types present (member payloads are NOT read — tarfile walks the
    512-byte headers only).  Lets assembled_from_paths build exactly
    the per-type decode branches a given archive needs."""
    import tarfile

    types: set[str] = set()
    with tarfile.open(path, "r:*") as tf:
        for m in tf.getmembers():
            if m.isfile():
                types.add(path_to_filetype(m.name))
    return types


def read_tar_members(
    spark: SparkSession,
    tar_paths: list[str],
    types: set[str] | None = None,
) -> DataFrame:
    """Explode tar archives (.tar / .tar.gz / .tgz / .tar.bz2 /
    .tar.xz) into one row per member file — (path='tar!member',
    modificationTime, content) — executor-side, one archive per
    mapInPandas row (binaryFile never splits a file, matching s4's
    one-reader-per-archive model in process_path_tar,
    filepreprocessor.rs:1205-1260).

    ``types`` restricts extraction to members of those inner file
    types (path_to_filetype on the member name), so a branch that
    only needs the .evtx members of a mixed archive skips the byte
    copy of everything else.  Member bytes stay RAW (a .log.gz
    member keeps its gzip framing) — every downstream decoder
    already decompresses by path suffix."""
    import io
    import tarfile

    import pandas as pd

    bf = spark.read.format("binaryFile").load(
        [hadoop_glob_escape(p) for p in tar_paths]
    )
    schema = "path string, modificationTime timestamp, content binary"

    def explode(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                # per-archive fault isolation (same contract as the
                # text decode): one unreadable archive warns + skips
                try:
                    with tarfile.open(
                        fileobj=io.BytesIO(bytes(content)), mode="r:*"
                    ) as tf:
                        for m in tf.getmembers():
                            if not m.isfile():
                                continue
                            if (
                                types
                                and path_to_filetype(m.name)
                                not in types
                            ):
                                continue
                            rows.append(
                                (
                                    f"{path}!{m.name}",
                                    # pax headers can carry float
                                    # mtimes — floor to µs, pin UTC
                                    pd.Timestamp(
                                        m.mtime, unit="s", tz="UTC"
                                    ).floor("us"),
                                    tf.extractfile(m).read(),
                                )
                            )
                except Exception as ex:  # noqa: BLE001
                    import sys as _sys

                    print(
                        f"WARNING: failed to read archive {path!r}: "
                        f"{type(ex).__name__}: {ex}",
                        file=_sys.stderr,
                    )
                    continue
            yield pd.DataFrame(
                rows, columns=["path", "modificationTime", "content"]
            )

    return bf.select("path", "modificationTime", "content").mapInPandas(
        explode, schema
    )


def assembled_from_paths(
    spark: SparkSession,
    paths: list[str] | str,
    tz_offset_min: int = 0,
    invalid_out: list | None = None,
) -> DataFrame:
    """`s4 <paths>` parity: route each input file by type
    (path_to_filetype), run the text pipeline (encoding-aware read →
    pattern-bank parse with per-source mtime anchor years → repair →
    sysline assembly) on the text group, and map the binary readers'
    already-timestamped records (evtx / journal / fixedstruct)
    straight onto the assembled schema — the reference's
    per-LogMessageType processing fan-in (s4.rs processing_loop) as a
    unionByName.  The result feeds dt_filter + merge_ordered
    unchanged."""
    from pyspark.sql import functions as F

    from .. import pipeline as P

    if isinstance(paths, str):
        paths = [paths]
    groups: dict[str, list[str]] = {}
    invalid: list[str] = []
    for p in paths:
        matches = _glob.glob(p) or [p]
        for g in matches:
            # s4 recursively walks directory inputs
            # (filepreprocessor.rs process_path) and warns about
            # unprocessable paths, continuing
            # (print_files_processpathresult); an all-invalid input
            # set is still an error
            if os.path.isdir(g):
                found = False
                for root, _dirs, files in os.walk(g):
                    for fn in sorted(files):
                        fp = os.path.join(root, fn)
                        if os.path.isfile(fp):
                            found = True
                            groups.setdefault(
                                path_to_filetype(fp), []
                            ).append(fp)
                if not found:
                    invalid.append(g)
                continue
            if not os.path.isfile(g):
                invalid.append(g)
                continue
            groups.setdefault(path_to_filetype(g), []).append(g)
    if invalid:
        import sys as _sys

        for g in invalid:
            print(f"WARNING: not processed: {g!r}", file=_sys.stderr)
        if invalid_out is not None:
            invalid_out.extend(invalid)
    # archives: scan headers driver-side, then fan each archive's
    # members into the decode branch of their INNER type — a wtmp or
    # .evtx member inside a .tar must reach its binary reader, not
    # the text parser (filepreprocessor.rs:1205-1260 routes each tar
    # entry by its own filetype)
    tar_types: dict[str, set[str]] = {}
    for tp in groups.pop("tar", []):
        try:
            tar_types[tp] = tar_member_types(tp)
        except Exception as ex:  # noqa: BLE001
            import sys as _sys

            print(
                f"WARNING: failed to read archive {tp!r}: "
                f"{type(ex).__name__}: {ex}",
                file=_sys.stderr,
            )

    def tars_with(t: str) -> list[str]:
        return [p for p, ts in tar_types.items() if t in ts]

    def members_of(t: str) -> DataFrame:
        return read_tar_members(spark, tars_with(t), types={t})

    if not groups and not any(tar_types.values()):
        raise ValueError(f"no readable inputs among {paths!r}")
    parts: list[DataFrame] = []
    sel = [
        "conv_id", "turn_idx", "role", "tool", "text", "ts",
        "ts_eff", "sink_eff", "msg_turn_idx",
    ]
    text_lines: list[DataFrame] = []
    if "text" in groups:
        text_lines.append(
            read_log_files_decoded(spark, groups["text"])
        )
    if tars_with("text"):
        text_lines.append(decode_text_binary_df(members_of("text")))
    if text_lines:
        lines = text_lines[0]
        for x in text_lines[1:]:
            lines = lines.unionByName(x)
        asm = P.assembled_files(lines, tz_offset_min=tz_offset_min)
        parts.append(asm.select(*sel))

    def binary_records(t: str, reader, decode_batches, schema):
        recs: list[DataFrame] = []
        if t in groups:
            recs.append(reader(spark, groups[t]))
        if tars_with(t):
            recs.append(
                members_of(t)
                .select("path", "content")
                .mapInPandas(decode_batches, schema)
            )
        if not recs:
            return None
        out = recs[0]
        for x in recs[1:]:
            out = out.unionByName(x)
        return out

    from ..operators import evtx as _evtx
    from ..operators import fixedstruct as _fx
    from ..operators import journal as _jr

    ev = binary_records(
        "evtx", _evtx.read_evtx, _evtx._decode_batches,
        _evtx.RECORDS_SCHEMA,
    )
    if ev is not None:
        parts.append(
            ev.select(
                F.col("source").alias("conv_id"),
                F.col("rec_idx").cast("int").alias("turn_idx"),
                F.lit("evtx").alias("role"),
                F.lit("none").alias("tool"),
                F.col("payload").alias("text"),
                F.col("ts"),
                F.col("ts").alias("ts_eff"),
                F.lit("evtx").alias("sink_eff"),
                F.col("rec_idx").cast("int").alias("msg_turn_idx"),
            )
        )
    jr = binary_records(
        "journal", _jr.read_journal, _jr._decode_batches,
        _jr.RECORDS_SCHEMA,
    )
    if jr is not None:
        parts.append(
            jr.select(
                F.col("source").alias("conv_id"),
                F.col("rec_idx").cast("int").alias("turn_idx"),
                F.coalesce(
                    F.nullif("identifier", F.lit("")), F.lit("journal")
                ).alias("role"),
                F.lit("none").alias("tool"),
                F.col("message").alias("text"),
                F.col("ts"),
                F.col("ts").alias("ts_eff"),
                F.lit("journal").alias("sink_eff"),
                F.col("rec_idx").cast("int").alias("msg_turn_idx"),
            )
        )
    from ..operators import asl as _asl

    al = binary_records(
        "asl", _asl.read_asl, _asl._decode_batches,
        _asl.RECORDS_SCHEMA,
    )
    if al is not None:
        # text = the validated ASL rendering (UTC ISO ts + key=value
        # fields), the line shape the reference emits for .asl
        parts.append(
            al.select(
                F.col("source").alias("conv_id"),
                F.col("rec_idx").cast("int").alias("turn_idx"),
                F.lit("asl").alias("role"),
                F.lit("none").alias("tool"),
                F.col("line").alias("text"),
                F.col("ts"),
                F.col("ts").alias("ts_eff"),
                F.lit("asl").alias("sink_eff"),
                F.col("rec_idx").cast("int").alias("msg_turn_idx"),
            )
        )

    from ..operators import etl as _etl

    et = binary_records(
        "etl", _etl.read_etl, _etl._decode_batches,
        _etl.RECORDS_SCHEMA,
    )
    if et is not None:
        # text = the reference's rendered ETL record line
        parts.append(
            et.select(
                F.col("source").alias("conv_id"),
                F.col("rec_idx").cast("int").alias("turn_idx"),
                F.lit("etl").alias("role"),
                F.lit("none").alias("tool"),
                F.col("line").alias("text"),
                F.col("ts"),
                F.col("ts").alias("ts_eff"),
                F.lit("etl").alias("sink_eff"),
                F.col("rec_idx").cast("int").alias("msg_turn_idx"),
            )
        )

    from ..operators import odl as _odl

    od = binary_records(
        "odl", _odl.read_odl, _odl._decode_batches,
        _odl.RECORDS_SCHEMA,
    )
    if od is not None:
        # text = the reference's rendered ODL line
        # ('<epoch_ms> <file>:<function>; <params>', trailing params
        # omitted when empty) so merge/prepend/summary treat ODL rows
        # like any pre-stamped binary source
        parts.append(
            od.select(
                F.col("source").alias("conv_id"),
                F.col("rec_idx").cast("int").alias("turn_idx"),
                F.lit("odl").alias("role"),
                F.lit("none").alias("tool"),
                F.concat(
                    F.unix_millis("ts").cast("string"),
                    F.lit(" "),
                    F.col("code_file"),
                    F.lit(":"),
                    F.col("function"),
                    F.lit(";"),
                    F.when(
                        F.col("params") != "",
                        F.concat(F.lit(" "), F.col("params")),
                    ).otherwise(F.lit("")),
                ).alias("text"),
                F.col("ts"),
                F.col("ts").alias("ts_eff"),
                F.lit("odl").alias("sink_eff"),
                F.col("rec_idx").cast("int").alias("msg_turn_idx"),
            )
        )
    fx_dtype = _fx.LAYOUTS["utmpx_linux_x86_64"]
    fx = binary_records(
        "fixedstruct", _fx.read_fixedstruct,
        lambda it: _fx._decode_batches(it, fx_dtype),
        _fx.RECORDS_SCHEMA,
    )
    if fx is not None:
        parts.append(
            fx.select(
                F.col("source").alias("conv_id"),
                F.col("rec_idx").cast("int").alias("turn_idx"),
                F.lit("utmpx").alias("role"),
                F.lit("none").alias("tool"),
                F.concat_ws(
                    " ", "ut_user", "ut_line", "ut_host"
                ).alias("text"),
                F.col("ts"),
                F.col("ts").alias("ts_eff"),
                F.lit("utmpx").alias("sink_eff"),
                F.col("rec_idx").cast("int").alias("msg_turn_idx"),
            )
        )
    if not parts:
        raise ValueError(f"no readable inputs among {paths!r}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

"""Parse stage: attach extracted datetime columns to the transcripts.

One ArrowEvalPython node in the physical plan; everything before and
after stays in WholeStageCodegen.  Column pruning matters: the UDF
reads only ``text`` — Catalyst prunes the parquet scan accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.datetime_parse import make_parse_udf
from ..patterns import ANCHOR_YEAR_DEFAULT

PARSE_COLS = ["ts_parsed", "pattern_id", "sink", "dt_beg", "dt_end", "uptime_us"]


def learn_winners(
    df: DataFrame,
    anchor_year: int = ANCHOR_YEAR_DEFAULT,
    sample_turns: int = 8,
) -> DataFrame:
    """Per-conv dominant pattern from a bounded head sample — s4's
    blockzero analysis that freezes one DTPD per file
    (src/readers/syslinereader.rs:920, syslogprocessor.rs blockzero).

    sample_turns=8 (was 32, round 6): the winner table only steers
    ATTEMPT ORDER — bank entries are pairwise disjoint, so frozen
    output is identical for ANY winner table (test-pinned) — and 8
    head turns already pick each conv's dominant pattern; the smaller
    sample cuts the learning job (the serial broadcast-build prefix of
    every frozen run) ~4× on the parse side (guide §1.2: don't compute
    things you throw away).

    Samples turn_idx < sample_turns (the 'block zero'), parses with
    the full bank, and keeps each conv's most-frequent pattern id
    (ties → lowest id, matching conv_dominant_pattern).  Returns a
    (conv_id, winner_pid) DataFrame — NO driver collect: parse_stage
    broadcast-joins it onto the input, so at 10^9 conversations the
    winners stay distributed (swap the broadcast for a bucketed join
    when the winner table itself outgrows the broadcast threshold).
    """
    from pyspark.sql import Window

    sample = df.filter(F.col("turn_idx") < sample_turns)
    parsed = parse_stage(sample, anchor_year=anchor_year, winners=None)
    counts = (
        parsed.filter(F.col("pattern_id").isNotNull())
        .groupBy("conv_id", "pattern_id")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("n"), F.asc("pattern_id")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "conv_id", F.col("pattern_id").cast("int").alias("winner_pid")
        )
    )


def parse_stage(
    df: DataFrame,
    text_col: str = "text",
    anchor_year: int = ANCHOR_YEAR_DEFAULT,
    scatter: bool = True,
    winners: DataFrame | None = None,
    tz_offset_min: int = 0,
    anchor_from_ts: bool = False,
) -> DataFrame:
    """transcripts → transcripts + (ts_parsed, pattern_id, sink,
    dt_beg, dt_end, uptime_us).

    Equivalent reference flow: SyslineReader::find_datetime_in_line →
    bytes_to_regex_to_datetime (syslinereader.rs:1733,
    datetime.rs:1892) executed per line; here one vectorized pass.

    scatter: parse is row-independent, but the input is often
    partitioned by conv_id (upstream windows / table layout) and a
    hot conversation then makes one straggler task own ~20% of the
    rows.  A round-robin repartition to the cluster's parallelism
    before the UDF removes the straggler — the Spark analogue of s4's
    one-huge-file thread imbalance, and the skew fixture's reason to
    exist.  At 10^12 rows the same is achieved by file-split-sized
    input partitions (maxPartitionBytes), so the shuffle is skipped
    when the input is already well-partitioned.
    """
    if scatter:
        sc = df.sparkSession.sparkContext
        n = sc.defaultParallelism
        if "conv_id" in df.columns and "turn_idx" in df.columns:
            # hash-scatter on the unique row key instead of round-robin:
            # identical balance (the key is unique, so hashpartitioning
            # spreads rows uniformly and splits hot conversations), but
            # deterministic under task retry WITHOUT the local
            # sort-before-repartition pass every keyless repartition(n)
            # pays (SPARK-23207: round-robin must sort its input so
            # retried map tasks reproduce the same row placement)
            df = df.repartition(n, F.xxhash64("conv_id", "turn_idx"))
        else:
            df = df.repartition(n)
    if winners is not None:
        # winners is a tiny (conv_id, winner_pid) dim: broadcast-join
        # it in and hand the pid to the UDF as a COLUMN — no driver
        # collect anywhere on this path (round-2 verdict item)
        df = df.join(F.broadcast(winners), "conv_id", "left")
        udf = make_parse_udf(
            anchor_year, frozen=True, tz_offset_min=tz_offset_min
        )
        parsed = df.withColumn(
            "_p", udf(F.col("winner_pid"), F.col(text_col))
        ).drop("winner_pid")
    elif anchor_from_ts:
        # per-source anchor year from the mtime stand-in ts column
        # (log-file sources; syslogprocessor.rs:628-734)
        udf = make_parse_udf(
            anchor_year, tz_offset_min=tz_offset_min, anchor_from_ts=True
        )
        parsed = df.withColumn("_p", udf(F.col("ts"), F.col(text_col)))
    else:
        udf = make_parse_udf(anchor_year, tz_offset_min=tz_offset_min)
        parsed = df.withColumn("_p", udf(F.col(text_col)))
    return parsed.select("*", *[f"_p.{c}" for c in PARSE_COLS]).drop("_p")

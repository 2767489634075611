"""Sysline assembly: attach continuation lines to the previous
datetime-bearing message.

Reference: a Sysline is 1..N Lines whose first line carries the
datetime (src/data/mod.rs:34-44, src/data/sysline.rs:85-112);
SyslineReader::find_sysline accretes following no-datetime lines
(src/readers/syslinereader.rs:2842).

Spark form: the canonical sessionize-by-flag pattern — a running
``last(..., ignorenulls=True)`` over (conv_id, turn_idx) propagates
the anchor turn's identity forward.  Rows before the first anchor in
a conv keep null msg (s4: data before the first sysline datetime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assemble_stage(df: DataFrame) -> DataFrame:
    """Adds:
    msg_turn_idx — turn_idx of the message anchor (dt-bearing turn)
    ts_eff       — the message timestamp every line inherits
    sink_eff     — the message's sink (continuations route with it)
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    anchored = F.col("ts_parsed").isNotNull()
    # one select, not chained withColumns: all three running lasts
    # share one window spec, and a single Project lets the analyzer
    # host them in ONE Window node (one buffer pass over each conv
    # group instead of two — plans/r06/parse_only_after.txt)
    return df.select(
        "*",
        F.last(
            F.when(anchored, F.col("turn_idx")), ignorenulls=True
        ).over(w).alias("msg_turn_idx"),
        F.last("ts_parsed", ignorenulls=True).over(w).alias("ts_eff"),
        F.coalesce(
            F.last(
                F.when(anchored, F.col("sink")), ignorenulls=True
            ).over(w),
            F.lit("continuation"),
        ).alias("sink_eff"),
    )

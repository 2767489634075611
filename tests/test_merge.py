"""Merge-stage tests: total order, tie-breaking, salting equivalence.

The reference breaks datetime ties by CLI path order
(src/s4/s4.rs:6384-6398); our total order is (ts_eff, conv_id,
turn_idx) and must be identical under any partitioning.
"""

from __future__ import annotations

import datetime as dt

from super_speedy_syslog_searcher_spark.operators.assemble import (
    assemble_stage,
)
from super_speedy_syslog_searcher_spark.operators.merge import (
    merge_ordered,
    with_global_seq,
)
from super_speedy_syslog_searcher_spark.operators.parse import parse_stage
from super_speedy_syslog_searcher_spark.operators.repair import repair_stage

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _mk(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for c in range(4):
        for i in range(50):
            # identical timestamps across convs → exercises tie-break
            ts = t0 + dt.timedelta(seconds=i * 60)
            rows.append(
                (
                    f"conv-{c}",
                    i,
                    "user",
                    f"2024-01-01T{ts.strftime('%H:%M:%S')} msg {c}/{i}",
                    "none",
                    ts,
                )
            )
    return spark.createDataFrame(rows, SCHEMA)


def _pipeline(df):
    return assemble_stage(repair_stage(parse_stage(df)))


def test_tie_break_by_conv_then_turn(spark):
    out = with_global_seq(_pipeline(_mk(spark)))
    rows = sorted(out.collect(), key=lambda r: r["msg_seq"])
    keys = [(r["ts_eff"], r["conv_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys)
    # equal-ts group must be ordered by conv_id
    first4 = [r["conv_id"] for r in rows[:4]]
    assert first4 == ["conv-0", "conv-1", "conv-2", "conv-3"]


def test_partitioning_invariance(spark):
    """Same total order regardless of partition count."""
    base = _pipeline(_mk(spark))
    a = [
        (r["ts_eff"], r["conv_id"], r["turn_idx"])
        for r in merge_ordered(base, num_partitions=2).collect()
    ]
    b = [
        (r["ts_eff"], r["conv_id"], r["turn_idx"])
        for r in merge_ordered(base, num_partitions=17).collect()
    ]
    assert sorted(a) == sorted(b)
    assert a == sorted(a)
    assert b == sorted(b)


def test_hot_key_splits_across_partitions(spark):
    """Pathological skew: ONE conv, ONE ts_eff, 10^6 rows.  The range
    partitioner keys on the full unique (ts, conv, turn) tuple, so the
    run must split across partitions on turn_idx boundaries (balanced),
    and the global order must still be exact (msg_seq == turn_idx+1 —
    asserted distributedly, nothing large collected)."""
    import pyspark.sql.functions as F

    n, parts = 1_000_000, 8
    df = (
        spark.range(n)
        .select(
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts_eff"),
            F.lit("conv-hot").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
        )
    )
    stg: list = []
    out = with_global_seq(
        merge_ordered(df, num_partitions=parts), ordered=True, staging=stg
    )
    sizes = [
        r["cnt"]
        for r in out.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    assert len(sizes) == parts
    assert max(sizes) <= 2 * min(sizes)  # balanced despite one hot key
    assert out.filter(F.col("msg_seq") != F.col("turn_idx") + 1).count() == 0
    for s in stg:
        s.unpersist()


def test_global_seq_dense(spark):
    out = with_global_seq(_pipeline(_mk(spark)))
    seqs = sorted(r["msg_seq"] for r in out.collect())
    assert seqs == list(range(1, 201))

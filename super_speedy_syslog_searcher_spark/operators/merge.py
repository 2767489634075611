"""The global datetime-ordered merge — the reference's core product.

s4 runs one thread per file and k-way-merges head messages by
datetime, ties broken by CLI path order (src/s4/s4.rs:5410,
6384-6398).  The Spark-native equivalent is a **range-partitioned
sort**: repartitionByRange on the total-order key distributes ordered
key ranges across partitions (the shuffle), sortWithinPartitions
finishes each range locally — no single-node bottleneck, which is
what makes this hold at 10^12 rows where a thread-per-file merge
cannot.

Total order: (ts_eff, conv_id, turn_idx) — the deterministic analogue
of s4's (datetime, PathId, fileoffset).

A hot conv_id does NOT skew this shuffle: the range partitioner keys
on ts_eff first, so a conversation with 20% of all rows spreads over
every time bucket.  Skew would only appear if many rows shared one
exact (ts, conv) key; `salt_buckets` adds an explicit turn-derived
salt to the range key for that case (north_rule's salted
repartition-by-(ts-bucket, conv_id)).

The global sequence number uses the scalable two-phase pattern
(per-partition row_number + collected partition offsets) instead of a
single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORDER_KEYS = ["ts_eff", "conv_id", "turn_idx"]


def dt_filter(
    df: DataFrame,
    after: str | None = None,
    before: str | None = None,
    ts_col: str = "ts_eff",
) -> DataFrame:
    """-a/-b datetime window (src/data/datetime.rs:2049,2095).

    On a ts-partitioned Iceberg/parquet table this predicate prunes
    partitions and row-groups before any parse work; null ts (rows
    before a conv's first anchor) never pass, matching s4 dropping
    data before the first sysline.
    """
    if after is not None:
        df = df.filter(F.col(ts_col) >= F.lit(after).cast("timestamp"))
    if before is not None:
        df = df.filter(F.col(ts_col) <= F.lit(before).cast("timestamp"))
    return df


def merge_ordered(
    df: DataFrame,
    num_partitions: int | None = None,
    salt_buckets: int = 0,
) -> DataFrame:
    """Globally (ts_eff, conv_id, turn_idx)-ordered rows.

    With salt_buckets > 0 the range key gains a turn-derived salt
    column so a pathological single-(ts,conv) hot key splits across
    buckets; order is unaffected because the salt follows the total
    order key.
    """
    keys = [F.col(k) for k in ORDER_KEYS]
    if salt_buckets > 0:
        df = df.withColumn(
            "_salt", (F.col("turn_idx") % salt_buckets).cast("int")
        )
        keys = [F.col("ts_eff"), F.col("conv_id"), F.col("turn_idx"), F.col("_salt")]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)
    return out.drop("_salt") if salt_buckets > 0 else out


def with_global_seq(df: DataFrame, seq_col: str = "msg_seq") -> DataFrame:
    """Attach a 1-based global sequence number in total order.

    Two-phase: row_number within each range partition, plus the
    cumulative count of preceding partitions (only #partitions values
    cross the driver — scale-safe, unlike a global row_number window
    which funnels every row through one task).
    """
    from pyspark.sql import Window

    ordered = merge_ordered(df)
    with_pid = ordered.withColumn("_pid", F.spark_partition_id())
    counts = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(k) for k in ORDER_KEYS])
    return (
        with_pid.join(F.broadcast(off_df), "_pid")
        .withColumn(seq_col, F.row_number().over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )

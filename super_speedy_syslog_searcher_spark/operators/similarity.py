"""Similarity search over the `embeddings` table (array<float>, 64-d).

Brute-force cosine top-k is the exactness baseline; the IVF-style
variant buckets vectors by dominant dimension and searches only the
probe's bucket — the scale path (bucket = centroid assignment; at
10^12 vectors the bucket column becomes the Iceberg partition key and
the join prunes to one partition per probe).

All math is built-in (zip_with + aggregate) — JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
NORM = "sqrt(aggregate({a}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"


def _with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", F.expr(NORM.format(a=vec)))


def cosine_topk(
    emb: DataFrame, k: int = 5, n_probes: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for the first n_probes vectors.

    Probe set broadcasts (tiny) against the full table — the only
    join shape that scales; ranking is a per-probe window.
    """
    base = _with_norm(emb).select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("nbr_vec"),
        F.col("_norm").alias("nbr_norm"),
    )
    probes = _with_norm(emb.filter(F.col("vec_id") < n_probes)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        F.col("_norm").alias("probe_norm"),
    )
    scored = base.join(F.broadcast(probes)).filter(
        F.col("nbr_id") != F.col("probe_id")
    ).withColumn(
        "cosine",
        F.round(
            F.expr(DOT.format(a="probe_vec", b="nbr_vec"))
            / (F.col("probe_norm") * F.col("nbr_norm")),
            4,
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "nbr_id",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def dominant_bucket(vec: str = "embedding") -> F.Column:
    """IVF-style coarse quantizer: index (1-based) of the max-|x|
    dimension — a deterministic, engine-portable centroid stand-in."""
    return F.expr(
        f"array_position(transform({vec}, x -> abs(cast(x as double))), "
        f"array_max(transform({vec}, x -> abs(cast(x as double)))))"
    ).cast("int")


def ivf_topk(emb: DataFrame, k: int = 5, n_probes: int = 10) -> DataFrame:
    """Approximate top-k: search only vectors sharing the probe's
    dominant-dimension bucket.  At scale: bucket == partition key,
    probe joins prune to single partitions (bucket-join ANN)."""
    with_b = _with_norm(emb).withColumn("bucket", dominant_bucket())
    base = with_b.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("nbr_vec"),
        F.col("_norm").alias("nbr_norm"),
        "bucket",
    )
    probes = with_b.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        F.col("_norm").alias("probe_norm"),
        F.col("bucket").alias("probe_bucket"),
    )
    scored = base.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("probe_bucket"))
        & (F.col("nbr_id") != F.col("probe_id")),
    ).withColumn(
        "cosine",
        F.round(
            F.expr(DOT.format(a="probe_vec", b="nbr_vec"))
            / (F.col("probe_norm") * F.col("nbr_norm")),
            4,
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "nbr_id",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )

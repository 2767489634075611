"""Similarity search over the `embeddings` table (array<float>).

Brute-force cosine top-k is the exactness baseline; the IVF variant
quantizes vectors into K_SEEDS coarse cells by nearest centroid and
searches each probe's NPROBE_CELLS closest cells (nprobe > 1).
Centroids are the table's first K_SEEDS vectors — deterministic and
data-dependent, so both engines (Spark and the DuckDB oracle) derive
the identical codebook from the data with no shipped state.  A
sign-of-random-projection quantizer was tried first and measured
recall@5 = 0.48-0.84 on these near-uniform embeddings; nearest-seed
cells reach 0.92 while scanning ~18% of the corpus.

At 10^12 vectors the cell id becomes the Iceberg partition key and
each probe prunes to nprobe partitions — the bucket-join ANN shape;
the centroid table stays a broadcast.

All math is built-in (zip_with + aggregate) — JVM-side, no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K_SEEDS = 16  # codebook floor (first K vectors = centroids)
NPROBE_CELLS = 3  # cells searched per probe at the K_SEEDS floor


def default_k_seeds(n: int) -> int:
    """Codebook size as a function of corpus size: ceil(sqrt(n)),
    floored at K_SEEDS.  With k = sqrt(n) cells the expected cell
    occupancy is sqrt(n) and the same-cell candidate-pair volume of
    embedding_near_dups is O(n^1.5) total — bounded per cell — where
    a FIXED codebook degrades to O(n^2 / k) (the round-4 scale
    finding).  Both engines must derive the identical k, so the
    formula is plain IEEE-double ceil(sqrt(n)) (DuckDB:
    ``greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT))``)."""
    return max(K_SEEDS, math.ceil(math.sqrt(n)))


def default_nprobe(k_seeds: int) -> int:
    """Probe width scaling with the codebook: ceil(3k/16) keeps the
    scanned fraction of the corpus at the measured-recall operating
    point (3 of 16 cells ≈ 19%) as k grows — on near-uniform
    embeddings recall is a function of the scanned fraction, so this
    holds recall@5 ≈ 0.9 while per-probe work drops from O(n) to
    O(sqrt(n)) rows per cell."""
    return math.ceil(3 * k_seeds / 16)

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


def seed_scores(emb: DataFrame, k_seeds: int = None) -> DataFrame:
    """Cosine-to-centroid scores (vec_id, embedding, _norm, seed_id,
    sscore).  Centroids are the first k_seeds vectors of the table —
    deterministic, data-dependent (the "hash-seeded centroids" form of
    an IVF codebook; a k-means refinement would only move the seeds,
    not the plan shape).  k_seeds defaults to ceil(sqrt(n))
    (default_k_seeds; the count is a metadata-only scan on a
    parquet/Iceberg table).  The seed side is O(sqrt(n)) rows →
    broadcast join even at 10^12 vectors (10^6 seed rows ≈ tens of
    MB); the /|v| factor is constant per vector so argmax works on
    dot/|seed| alone.
    """
    k_seeds = k_seeds or default_k_seeds(emb.count())
    base = _with_norm(emb)
    seeds = _with_norm(emb.filter(F.col("vec_id") < k_seeds)).select(
        F.col("vec_id").alias("seed_id"),
        F.col("embedding").alias("seed_vec"),
        F.col("_norm").alias("seed_norm"),
    )
    return base.join(F.broadcast(seeds)).select(
        "vec_id",
        "embedding",
        "_norm",
        "seed_id",
        (
            F.expr(DOT.format(a="embedding", b="seed_vec"))
            / F.col("seed_norm")
        ).alias("sscore"),
    )


NEAR_DUP_THRESHOLD = 0.98


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = NEAR_DUP_THRESHOLD,
    nprobe_cells: int = 2,
    k_seeds: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b,
    cosine >= threshold) via IVF-bucket candidates — never all-pairs.

    Every vector is assigned to its nprobe_cells nearest coarse cells
    (multi-probe assignment: a near-dup pair straddling a cell
    boundary still co-occurs in one cell); candidate pairs are the
    same-cell self-join; exact cosine verifies.  The same-cell join
    shuffles on the cell id only — at 10^12 vectors the cell id is the
    Iceberg partition key and each cell's pair set stays local, the
    bucket-join shape of dedup.minhash_band_pairs.  Thresholding on
    the 4-decimal-rounded cosine keeps the cut engine-portable.
    """
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("sscore"), F.asc("seed_id")
    )
    k_seeds = k_seeds or default_k_seeds(emb.count())
    ranked = (
        seed_scores(emb, k_seeds)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe_cells)
        .select(
            "vec_id",
            "embedding",
            "_norm",
            F.col("seed_id").alias("bucket"),
        )
    )
    a = ranked.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("va"),
        F.col("_norm").alias("na"),
        "bucket",
    )
    b = ranked.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("vb"),
        F.col("_norm").alias("nb"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                F.expr(DOT.format(a="va", b="vb"))
                / (F.col("na") * F.col("nb")),
                4,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        # multi-probe can surface a pair in two shared cells; the
        # cosine is identical both times, so max == the value
        .groupBy("vec_a", "vec_b")
        .agg(F.max("cosine").alias("cosine"))
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_probes: int = 10,
    nprobe_cells: int | None = None,
    k_seeds: int | None = None,
) -> DataFrame:
    """Approximate top-k, IVF-style: every vector lives in the cell of
    its nearest centroid; a probe searches its nprobe_cells closest
    cells (nprobe > 1).  Measured recall@5 = 0.92 vs exact cosine at
    ~18% of the corpus scanned (tests/test_training_ops.py::
    test_ivf_recall_at_5).  At 10^12 vectors the cell id becomes the
    Iceberg partition key and each probe prunes to nprobe partitions —
    the bucket-join ANN shape; the centroid table stays a broadcast.
    """
    k_seeds = k_seeds or default_k_seeds(emb.count())
    nprobe_cells = nprobe_cells or default_nprobe(k_seeds)
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("sscore"), F.asc("seed_id")
    )
    ranked = seed_scores(emb, k_seeds).withColumn(
        "rn", F.row_number().over(w)
    )
    base = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("nbr_vec"),
        F.col("_norm").alias("nbr_norm"),
        F.col("seed_id").alias("bucket"),
    )
    probes = ranked.filter(
        (F.col("vec_id") < n_probes) & (F.col("rn") <= nprobe_cells)
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        F.col("_norm").alias("probe_norm"),
        F.col("seed_id").alias("probe_bucket"),
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
    wr = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "nbr_id",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


SEMANTIC_DEDUP_THRESHOLD = 0.95


def semantic_dedup(
    emb: DataFrame,
    threshold: float = SEMANTIC_DEDUP_THRESHOLD,
    k_seeds: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: assign every vector to
    its nearest coarse cell (broadcast centroid scoring, the IVF
    codebook of seed_scores), pick one deterministic representative
    per cell (lowest vec_id), and mark every other member whose
    cosine to the representative clears the threshold as a drop.

    The cell-member → representative join keys on the CELL id — one
    row per cell on the build side (broadcastable at any corpus size
    with a bounded codebook), so at 10^12 vectors the comparison
    volume is n_vectors × 1, never pairwise.  Output: one row per
    vector with its cell, representative, rounded cosine-to-rep and
    the keep/drop verdict (representatives always keep).
    """
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("sscore"), F.asc("seed_id")
    )
    cells = (
        seed_scores(emb, k_seeds or default_k_seeds(emb.count()))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "_norm", F.col("seed_id").alias("cell"))
    )
    w_cell = Window.partitionBy("cell").orderBy("vec_id")
    reps = (
        cells.withColumn("rr", F.row_number().over(w_cell))
        .filter(F.col("rr") == 1)
        .select(
            "cell",
            F.col("vec_id").alias("rep_id"),
            F.col("embedding").alias("rv"),
            F.col("_norm").alias("rnrm"),
        )
    )
    cos = F.round(
        F.expr(DOT.format(a="embedding", b="rv"))
        / (F.col("_norm") * F.col("rnrm")),
        4,
    )
    return cells.join(F.broadcast(reps), "cell").select(
        "vec_id",
        F.col("cell").cast("bigint").alias("cell"),
        F.col("rep_id").cast("bigint").alias("rep_id"),
        cos.alias("cos_to_rep"),
        (
            (F.col("vec_id") == F.col("rep_id")) | (cos < threshold)
        ).alias("keep"),
    )

"""K-means clustering over the embedding column — the corpus-curation
clustering stage (topic balancing, cluster-based dedup/sampling a la
SemDeDup's outer loop), done Lloyd's-style but in FIXED-POINT integer
arithmetic end to end:

  * embeddings quantize once to 2^20-scaled bigints
    (``floor(x * 2^20 + 0.5)``);
  * distances are exact integer sums of squared diffs;
  * centroid updates are truncating integer means (``div`` semantics,
    toward zero — Spark ``div`` == DuckDB ``//`` == the helper below).

Why integers: float k-means is order-of-summation nondeterministic on
a distributed reduce, so assignments can flip between runs on
near-ties.  The fixed-point form makes every iteration bit-reproducible
across runs AND across engines, which turns an iterative algorithm into
a hash-checkable oracle query (the DuckDB oracle replays the same
iterations as chained CTEs).

Scale shape: each iteration is one narrow map (argmin over k broadcast
centroid literals — k*dim longs, trivially broadcastable) plus one
groupBy(cluster, dim) over the posexploded vectors (map-side combined;
k*dim rows reach the driver).  No cross join, no window, no global
sort; at 10^12 vectors the per-iteration cost is two scans of the
persisted quantized table.

Reference parity: s4 has no clustering; this is a training-data op
(SURVEY.md LLM-pipeline section) in the same broadcast-small-table
pattern as its DTPD bank (src/data/datetime.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KM_SCALE = 1 << 20


def _trunc_div(s: int, c: int) -> int:
    """Integer division truncating toward zero — Spark `div` / DuckDB
    `//` semantics (Python `//` floors, which differs for negatives)."""
    q = abs(s) // c
    return q if s >= 0 else -q


def quantize(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """(vec_id, q): embedding quantized to 2^20-scaled bigints."""
    return emb.select(
        "vec_id",
        F.expr(
            f"transform({col}, x -> CAST(floor(CAST(x AS DOUBLE)"
            f" * {KM_SCALE}D + 0.5D) AS BIGINT))"
        ).alias("q"),
    )


def _assign(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Add (cluster, dist_sq) = argmin over the broadcast centroid
    literals.  Ties break toward the smallest cluster id (struct
    array_min compares (dist, cid) lexicographically)."""
    structs = []
    for cid, c in enumerate(centroids):
        arr = ",".join(f"{v}L" for v in c)
        structs.append(
            F.struct(
                F.expr(
                    f"aggregate(zip_with(q, array({arr}),"
                    " (x, y) -> (x - y) * (x - y)),"
                    " 0L, (a, v) -> a + v)"
                ).alias("dist_sq"),
                F.lit(cid).alias("cid"),
            )
        )
    best = F.array_min(F.array(*structs))
    return q.select(
        "vec_id",
        "q",
        best["cid"].alias("cluster"),
        best["dist_sq"].alias("dist_sq"),
    )


def kmeans_embed(
    emb: DataFrame, k: int = 8, n_iter: int = 4
) -> DataFrame:
    """Lloyd's k-means, `n_iter` iterations, deterministic init =
    embeddings of the k smallest vec_ids.  Returns (vec_id, cluster,
    dist_sq) under the FINAL centroids.  Empty clusters carry their
    previous centroid (standard Lloyd's convention)."""
    qdf = quantize(emb)
    qdf.persist()
    try:
        init = qdf.orderBy("vec_id").limit(k).collect()
        centroids = [list(r["q"]) for r in init]
        for _ in range(n_iter):
            assigned = _assign(qdf, centroids)
            rows = (
                assigned.select(
                    "cluster", F.posexplode("q").alias("pos", "val")
                )
                .groupBy("cluster", "pos")
                .agg(
                    F.sum("val").alias("s"),
                    F.count("*").alias("c"),
                )
                .collect()
            )
            new = [list(c) for c in centroids]  # empties carry over
            for r in rows:
                new[r["cluster"]][r["pos"]] = _trunc_div(
                    int(r["s"]), int(r["c"])
                )
            centroids = new
        return _assign(qdf, centroids).select(
            "vec_id",
            F.col("cluster").cast("int").alias("cluster"),
            F.col("dist_sq").cast("bigint").alias("dist_sq"),
        )
    finally:
        qdf.unpersist()


def kmeans_oracle_sql(
    k: int = 8, n_iter: int = 4, dim: int = 64, table: str = "embeddings"
) -> str:
    """DuckDB replay of kmeans_embed as chained CTEs — one
    (assignment, centroid-update) pair per iteration.  Exact hash
    equality holds because every step is integer arithmetic with
    matching truncation semantics."""
    scale = KM_SCALE
    parts = [
        f"""WITH q AS (
  SELECT vec_id, list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT)) AS q
  FROM {table}),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, q AS c
  FROM (SELECT vec_id, q FROM q ORDER BY vec_id LIMIT {k}))"""
    ]
    dist = (
        "CAST(list_sum(list_transform(generate_series(1, {d}),"
        " i -> (q[i] - c[i]) * (q[i] - c[i]))) AS BIGINT)".format(d=dim)
    )
    for t in range(1, n_iter + 1):
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, q, cid, dist_sq FROM (
    SELECT vec_id, q, cid, {dist} AS dist_sq,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {dist}, cid) AS rn
    FROM q CROSS JOIN c{t - 1}) WHERE rn = 1),
s{t} AS (
  SELECT cid, i.i AS i,
         CAST(sum(q[i.i]) AS BIGINT) AS s, count(*) AS cnt
  FROM a{t}, generate_series(1, {dim}) AS i(i)
  GROUP BY cid, i.i),
c{t} AS (
  SELECT p.cid, coalesce(n.c, p.c) AS c
  FROM c{t - 1} p LEFT JOIN (
    SELECT cid, list(s // cnt ORDER BY i) AS c FROM s{t} GROUP BY cid
  ) n USING (cid))"""
        )
    parts.append(
        f"""fin AS (
  SELECT vec_id, cid, dist_sq FROM (
    SELECT vec_id, cid, {dist} AS dist_sq,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {dist}, cid) AS rn
    FROM q CROSS JOIN c{n_iter}) WHERE rn = 1)
SELECT vec_id, CAST(cid AS INT) AS cluster,
       CAST(dist_sq AS BIGINT) AS dist_sq
FROM fin"""
    )
    head, tail = parts[0], parts[1:]
    return head + ",\n" + ",\n".join(tail[:-1]) + ",\n" + tail[-1]

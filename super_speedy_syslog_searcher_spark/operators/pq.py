"""Product quantization (PQ) for embedding compression + ANN — the
memory-side scale technique for vector search (Jegou, Douze, Schmid
2011, "Product quantization for nearest neighbor search"): split each
d-dim vector into M subvectors, k-means each subspace independently
(trained here with operators/cluster.py's fixed-point integer Lloyd's
recipe), and store each vector as M byte-sized code ids.  At 10^12
vectors, 64 floats (256 B) collapse to M=4 bytes — the difference
between "the index fits in cluster RAM" and "it doesn't" — and query
cost becomes a per-vector table lookup (asymmetric distance
computation, ADC): dist_est(v) = sum_s lut_s[code_s(v)] where
lut_s[c] = ||probe_s - centroid_s[c]||^2 is an M x K table computed
ONCE per probe.

Everything is fixed-point integer arithmetic (cluster.KM_SCALE
quantization, truncating division), so training, encoding, and ADC
are bit-reproducible across runs AND engines — the DuckDB oracle
(pq_oracle_sql) replays the identical subspace k-means iterations as
chained CTEs and must agree hash-for-hash.

Scale shape: training per iteration is ONE corpus pass — the M
argmins are narrow maps over broadcast centroid literals (M*K*SUB
longs), and the update is a single posexplode groupBy(subspace, code,
dim) partial agg (M*K*SUB rows to the driver, like cluster.py).
Encoding is a pure narrow map; the ADC scan is a narrow map + a
TakeOrdered top-k (per-partition heaps), never a global sort.  The
LUT is M*K integers — broadcast-trivial no matter the corpus size.

Reference parity: s4 has no vector ops; this is a training-data op
(SURVEY.md LLM-pipeline section) beside similarity.py's IVF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import KM_SCALE, _trunc_div, quantize

PQ_M = 4  # subspaces
PQ_K = 16  # codes per subspace
PQ_ITER = 2  # Lloyd iterations per subspace


def _sub_dist_expr(start: int, sub: int, cent: list[int]) -> str:
    arr = ",".join(f"{v}L" for v in cent)
    return (
        f"aggregate(zip_with(slice(q, {start}, {sub}), array({arr}),"
        " (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"
    )


def _with_codes(
    qdf: DataFrame,
    codebooks: list[list[list[int]]],
    sub: int,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """Add code_0..code_{M-1}: per-subspace argmin over the broadcast
    centroid literals (ties toward the smallest code id)."""
    cols = []
    for s, cents in enumerate(codebooks):
        start = s * sub + 1
        structs = [
            F.struct(
                F.expr(_sub_dist_expr(start, sub, c)).alias("dist_sq"),
                F.lit(cid).alias("cid"),
            )
            for cid, c in enumerate(cents)
        ]
        cols.append(
            F.array_min(F.array(*structs))["cid"].alias(f"code_{s}")
        )
    return qdf.select("vec_id", "q", *extra, *cols)


def pq_train(
    qdf: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    n_iter: int = PQ_ITER,
) -> list[list[list[int]]]:
    """Train M codebooks of K centroids on the quantized vectors,
    deterministic init = subvectors of the k smallest vec_ids.  One
    corpus pass per iteration (all subspaces assigned in the same
    select; one posexplode partial agg).  Empty cells carry their
    previous centroid."""
    dim = len(qdf.select("q").first()["q"])
    sub = dim // m
    init = qdf.orderBy("vec_id").limit(k).collect()
    codebooks = [
        [list(r["q"][s * sub : (s + 1) * sub]) for r in init]
        for s in range(m)
    ]
    code_arr = "array(" + ",".join(f"code_{s}" for s in range(m)) + ")"
    for _ in range(n_iter):
        assigned = _with_codes(qdf, codebooks, sub)
        rows = (
            assigned.select(
                F.expr(code_arr).alias("_codes"),
                F.posexplode("q").alias("pos", "val"),
            )
            .select(
                F.expr(f"pos DIV {sub}").cast("int").alias("s"),
                F.expr(f"element_at(_codes, CAST(pos DIV {sub} AS INT) + 1)")
                .cast("int")
                .alias("code"),
                F.expr(f"pos % {sub}").cast("int").alias("i"),
                "val",
            )
            .groupBy("s", "code", "i")
            .agg(F.sum("val").alias("sm"), F.count("*").alias("c"))
            .collect()
        )
        new = [[list(c) for c in cb] for cb in codebooks]  # carry empties
        for r in rows:
            new[r["s"]][r["code"]][r["i"]] = _trunc_div(
                int(r["sm"]), int(r["c"])
            )
        codebooks = new
    return codebooks


def pq_topk(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    n_iter: int = PQ_ITER,
    topk: int = 10,
) -> DataFrame:
    """Full PQ ANN pass: train codebooks, encode every vector as M
    codes, then answer one probe (the embedding of the smallest
    vec_id — deterministic) by ADC: est = sum_s lut_s[code_s], where
    the M x K lut is computed driver-side from the probe's subvectors.
    Output: topk rows (vec_id, code_0.., est_dist_sq, true_dist_sq)
    ordered by (est, vec_id) — true distance rides along so the
    quantization error is auditable per row."""
    qdf = quantize(emb).persist()
    try:
        dim = len(qdf.select("q").first()["q"])
        sub = dim // m
        codebooks = pq_train(qdf, m, k, n_iter)
        probe = list(
            qdf.orderBy("vec_id").limit(1).collect()[0]["q"]
        )
        luts = [
            [
                sum(
                    (probe[s * sub + i] - c[i]) ** 2
                    for i in range(sub)
                )
                for c in codebooks[s]
            ]
            for s in range(m)
        ]
        coded = _with_codes(qdf, codebooks, sub)
        est = None
        for s in range(m):
            arr = "array(" + ",".join(f"{v}L" for v in luts[s]) + ")"
            term = F.expr(f"element_at({arr}, code_{s} + 1)")
            est = term if est is None else est + term
        parr = ",".join(f"{v}L" for v in probe)
        true_d = F.expr(
            f"aggregate(zip_with(q, array({parr}),"
            " (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"
        )
        return (
            coded.select(
                "vec_id",
                *[
                    F.col(f"code_{s}").cast("int").alias(f"code_{s}")
                    for s in range(m)
                ],
                est.cast("bigint").alias("est_dist_sq"),
                true_d.cast("bigint").alias("true_dist_sq"),
            )
            .orderBy("est_dist_sq", "vec_id")
            .limit(topk)
        )
    finally:
        qdf.unpersist()


def pq_oracle_sql(
    m: int = PQ_M,
    k: int = PQ_K,
    n_iter: int = PQ_ITER,
    topk: int = 10,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB replay of pq_topk: per-subspace chained-CTE k-means
    (cluster.kmeans_oracle_sql's recipe on list slices), final codes,
    driver-free ADC via a LUT CTE, top-k by (est, vec_id).  All CTEs
    MATERIALIZED (DuckDB inlines CTEs by default; the chained
    multi-reference iterations would re-evaluate exponentially)."""
    sub = dim // m
    scale = KM_SCALE
    parts = [
        f"""WITH q AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT)) AS q
  FROM {table})"""
    ]
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        dist = (
            f"CAST(list_sum(list_transform(generate_series(1, {sub}),"
            f" i -> (q[{lo} - 1 + i] - c[i]) * (q[{lo} - 1 + i] - c[i])))"
            " AS BIGINT)"
        )
        parts.append(
            f"""c0_{s} AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         q[{lo}:{hi}] AS c
  FROM (SELECT vec_id, q FROM q ORDER BY vec_id LIMIT {k}))"""
        )
        for t in range(1, n_iter + 1):
            parts.append(
                f"""a{t}_{s} AS MATERIALIZED (
  SELECT vec_id, q, cid FROM (
    SELECT vec_id, q, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {dist}, cid) AS rn
    FROM q CROSS JOIN c{t - 1}_{s}) WHERE rn = 1),
s{t}_{s} AS MATERIALIZED (
  SELECT cid, i.i AS i,
         CAST(sum(q[{lo} - 1 + i.i]) AS BIGINT) AS sm, count(*) AS cnt
  FROM a{t}_{s}, generate_series(1, {sub}) AS i(i)
  GROUP BY cid, i.i),
c{t}_{s} AS MATERIALIZED (
  SELECT p.cid, coalesce(n.c, p.c) AS c
  FROM c{t - 1}_{s} p LEFT JOIN (
    SELECT cid, list(sm // cnt ORDER BY i) AS c
    FROM s{t}_{s} GROUP BY cid) n USING (cid))"""
            )
        parts.append(
            f"""code_{s} AS MATERIALIZED (
  SELECT vec_id, cid AS code FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {dist}, cid) AS rn
    FROM q CROSS JOIN c{n_iter}_{s}) WHERE rn = 1)"""
        )
    parts.append(
        """pr AS MATERIALIZED (
  SELECT q AS p FROM q ORDER BY vec_id LIMIT 1)"""
    )
    for s in range(m):
        lo = s * sub + 1
        parts.append(
            f"""lut_{s} AS MATERIALIZED (
  SELECT cid, CAST(list_sum(list_transform(generate_series(1, {sub}),
         i -> (p[{lo} - 1 + i] - c[i]) * (p[{lo} - 1 + i] - c[i])))
         AS BIGINT) AS d
  FROM c{n_iter}_{s} CROSS JOIN pr)"""
        )
    code_cols = ", ".join(
        f"CAST(code_{s}.code AS INT) AS code_{s}" for s in range(m)
    )
    code_joins = " ".join(
        f"JOIN code_{s} USING (vec_id)" for s in range(m)
    )
    lut_joins = " ".join(
        f"JOIN lut_{s} ON lut_{s}.cid = code_{s}.code" for s in range(m)
    )
    est = " + ".join(f"lut_{s}.d" for s in range(m))
    true_d = (
        f"CAST(list_sum(list_transform(generate_series(1, {dim}),"
        " i -> (q.q[i] - pr.p[i]) * (q.q[i] - pr.p[i]))) AS BIGINT)"
    )
    parts.append(
        f"""fin AS MATERIALIZED (
  SELECT q.vec_id AS vec_id, {code_cols},
         CAST({est} AS BIGINT) AS est_dist_sq,
         {true_d} AS true_dist_sq
  FROM q {code_joins} {lut_joins} CROSS JOIN pr)
SELECT * FROM fin ORDER BY est_dist_sq, vec_id LIMIT {topk}"""
    )
    head, tail = parts[0], parts[1:]
    return head + ",\n" + ",\n".join(tail[:-1]) + ",\n" + tail[-1]


def ivf_pq_topk(
    emb: DataFrame,
    k_coarse: int = 8,
    nprobe: int = 3,
    m: int = PQ_M,
    k: int = PQ_K,
    n_iter: int = PQ_ITER,
    topk: int = 10,
) -> DataFrame:
    """IVF-PQ — the production ANN index shape (FAISS IVFx,PQy): a
    coarse inverted-file layer prunes the corpus to the probe's
    `nprobe` nearest cells, then PQ ADC estimates distances only
    within those cells.  At 10^12 vectors the cell id is the
    partition key (scan touches nprobe partitions, not the corpus)
    and each candidate costs M table lookups on its byte codes — the
    two scale levers composed.

    Coarse centroids follow similarity.py's IVF convention (the
    k_coarse smallest vec_ids' vectors — deterministic, no training);
    cell assignment is the full-dim fixed-point argmin
    (cluster._assign).  Probe = the smallest vec_id's vector; its
    probed cells are the nprobe nearest coarse centroids by the same
    integer distance (cid tiebreak).  Output: topk candidates
    (vec_id, cell, est_dist_sq, true_dist_sq) by (est, vec_id).

    Every step is the established fixed-point recipe, so the DuckDB
    replay (ivf_pq_oracle_sql) agrees hash-for-hash."""
    from .cluster import _assign

    qdf = quantize(emb).persist()
    try:
        dim = len(qdf.select("q").first()["q"])
        sub = dim // m
        seeds = qdf.orderBy("vec_id").limit(k_coarse).collect()
        coarse = [list(r["q"]) for r in seeds]
        celled = _assign(qdf, coarse)  # vec_id, q, cluster, dist_sq
        codebooks = pq_train(qdf, m, k, n_iter)
        probe = list(qdf.orderBy("vec_id").limit(1).collect()[0]["q"])
        pd_ = sorted(
            (
                sum((a - b) ** 2 for a, b in zip(probe, c)),
                cid,
            )
            for cid, c in enumerate(coarse)
        )
        cells = [cid for _, cid in pd_[:nprobe]]
        cand = celled.filter(F.col("cluster").isin(cells))
        coded = _with_codes(cand, codebooks, sub, extra=("cluster",))
        luts = [
            [
                sum(
                    (probe[s * sub + i] - c[i]) ** 2
                    for i in range(sub)
                )
                for c in codebooks[s]
            ]
            for s in range(m)
        ]
        est = None
        for s in range(m):
            arr = "array(" + ",".join(f"{v}L" for v in luts[s]) + ")"
            term = F.expr(f"element_at({arr}, code_{s} + 1)")
            est = term if est is None else est + term
        parr = ",".join(f"{v}L" for v in probe)
        true_d = F.expr(
            f"aggregate(zip_with(q, array({parr}),"
            " (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"
        )
        return (
            coded.select(
                "vec_id",
                F.col("cluster").cast("int").alias("cell"),
                est.cast("bigint").alias("est_dist_sq"),
                true_d.cast("bigint").alias("true_dist_sq"),
            )
            .orderBy("est_dist_sq", "vec_id")
            .limit(topk)
        )
    finally:
        qdf.unpersist()


def ivf_pq_oracle_sql(
    k_coarse: int = 8,
    nprobe: int = 3,
    m: int = PQ_M,
    k: int = PQ_K,
    n_iter: int = PQ_ITER,
    topk: int = 10,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB replay of ivf_pq_topk: coarse cells + probed-cell
    pruning + the pq_oracle_sql PQ chain, ADC restricted to
    candidates.  All multi-reference CTEs MATERIALIZED."""
    sub = dim // m
    scale = KM_SCALE
    fulldist = (
        f"CAST(list_sum(list_transform(generate_series(1, {dim}),"
        " i -> (q[i] - c[i]) * (q[i] - c[i]))) AS BIGINT)"
    )
    parts = [
        f"""WITH q AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT)) AS q
  FROM {table}),
co AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, q AS c
  FROM (SELECT vec_id, q FROM q ORDER BY vec_id LIMIT {k_coarse})),
cel AS MATERIALIZED (
  SELECT vec_id, q, cid AS cell FROM (
    SELECT vec_id, q, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {fulldist}, cid) AS rn
    FROM q CROSS JOIN co) WHERE rn = 1),
prq AS MATERIALIZED (SELECT q AS p FROM q ORDER BY vec_id LIMIT 1),
pcells AS MATERIALIZED (
  SELECT cid FROM (
    SELECT cid,
           CAST(list_sum(list_transform(generate_series(1, {dim}),
             i -> (p[i] - c[i]) * (p[i] - c[i]))) AS BIGINT) AS d
    FROM co CROSS JOIN prq)
  ORDER BY d, cid LIMIT {nprobe}),
cand AS MATERIALIZED (
  SELECT vec_id, q, cell FROM cel WHERE cell IN (SELECT cid FROM pcells))"""
    ]
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        dist = (
            f"CAST(list_sum(list_transform(generate_series(1, {sub}),"
            f" i -> (q[{lo} - 1 + i] - c[i]) * (q[{lo} - 1 + i] - c[i])))"
            " AS BIGINT)"
        )
        parts.append(
            f"""c0_{s} AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         q[{lo}:{hi}] AS c
  FROM (SELECT vec_id, q FROM q ORDER BY vec_id LIMIT {k}))"""
        )
        for t in range(1, n_iter + 1):
            parts.append(
                f"""a{t}_{s} AS MATERIALIZED (
  SELECT vec_id, q, cid FROM (
    SELECT vec_id, q, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {dist}, cid) AS rn
    FROM q CROSS JOIN c{t - 1}_{s}) WHERE rn = 1),
s{t}_{s} AS MATERIALIZED (
  SELECT cid, i.i AS i,
         CAST(sum(q[{lo} - 1 + i.i]) AS BIGINT) AS sm, count(*) AS cnt
  FROM a{t}_{s}, generate_series(1, {sub}) AS i(i)
  GROUP BY cid, i.i),
c{t}_{s} AS MATERIALIZED (
  SELECT p.cid, coalesce(n.c, p.c) AS c
  FROM c{t - 1}_{s} p LEFT JOIN (
    SELECT cid, list(sm // cnt ORDER BY i) AS c
    FROM s{t}_{s} GROUP BY cid) n USING (cid))"""
            )
        parts.append(
            f"""code_{s} AS MATERIALIZED (
  SELECT vec_id, cid AS code FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {dist}, cid) AS rn
    FROM cand q CROSS JOIN c{n_iter}_{s}) WHERE rn = 1),
lut_{s} AS MATERIALIZED (
  SELECT cid, CAST(list_sum(list_transform(generate_series(1, {sub}),
         i -> (p[{lo} - 1 + i] - c[i]) * (p[{lo} - 1 + i] - c[i])))
         AS BIGINT) AS d
  FROM c{n_iter}_{s} CROSS JOIN prq)"""
        )
    code_joins = " ".join(
        f"JOIN code_{s} USING (vec_id)" for s in range(m)
    )
    lut_joins = " ".join(
        f"JOIN lut_{s} ON lut_{s}.cid = code_{s}.code" for s in range(m)
    )
    est = " + ".join(f"lut_{s}.d" for s in range(m))
    true_d = (
        f"CAST(list_sum(list_transform(generate_series(1, {dim}),"
        " i -> (cand.q[i] - prq.p[i]) * (cand.q[i] - prq.p[i])))"
        " AS BIGINT)"
    )
    parts.append(
        f"""fin AS MATERIALIZED (
  SELECT cand.vec_id AS vec_id, CAST(cand.cell AS INT) AS cell,
         CAST({est} AS BIGINT) AS est_dist_sq,
         {true_d} AS true_dist_sq
  FROM cand {code_joins} {lut_joins} CROSS JOIN prq)
SELECT * FROM fin ORDER BY est_dist_sq, vec_id LIMIT {topk}"""
    )
    head, tail = parts[0], parts[1:]
    return head + ",\n" + ",\n".join(tail[:-1]) + ",\n" + tail[-1]

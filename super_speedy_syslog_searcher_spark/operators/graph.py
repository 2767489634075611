"""Integer PageRank over a weighted edge relation — the link-analysis
primitive of web-corpus curation (page importance for crawl/keep
decisions, Common-Crawl-style domain ranking), demonstrated here over
the tool-transition graph of agent transcripts (which tool tends to
follow which).

Like operators/cluster.py's k-means and operators/rank.py's
Bradley-Terry, every step is FIXED-POINT integer arithmetic with
truncating division so the iterative algorithm is bit-reproducible
across runs AND engines, giving it a full hash oracle (DuckDB replays
the same iterations as chained CTEs, pagerank_oracle_cte below).

Update (damping d permille, N nodes, scale S):

    pr0_i  = S DIV N
    contrib_{j->i} = (pr_j * w_ji) DIV outw_j        (per in-edge)
    pr_i'  = ((1000-d) * (S DIV N)) DIV 1000
             + (d * sum_j contrib_{j->i}) DIV 1000

Dangling nodes (no out-edges) keep receiving the teleport term but
re-emit nothing — their mass decays rather than redistributing (the
documented variant; redistribution would add a global scalar per
iteration, same shape).

Scale shape — this one stays DISTRIBUTED through the iterations,
unlike the k x k driver loops: the rank table is node-sized (billions
of pages on a web graph), so each iteration is one hash join of ranks
against edges on the source key plus one groupBy(dst) partial agg —
two shuffles keyed on node id, no window, no collect.  Pre-joining
out-degrees onto the persisted edge table keeps the per-iteration
plan join+agg only.  Overflow: pr_j <= total mass ~= S, so
pr_j * w_ji < 2^63 needs w_ji < 2^43 — any real per-edge weight.

Reference parity: s4 has no graph ops; this is a training-data op
(SURVEY.md LLM-pipeline section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_SCALE = 1 << 20
PR_DAMP_PM = 850  # damping factor in permille (0.85)


def tool_edges(turns: DataFrame) -> DataFrame:
    """Weighted tool-transition edges: for each conversation, each
    consecutive pair of actual tool uses (rows with tool != 'none',
    in turn order) contributes one unit to edge (prev_tool -> tool).
    One conv_id-keyed Exchange feeds the lag window; the edge tally
    is a map-side-combined groupBy on the (src, dst) pair."""
    wo = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = (
        turns.filter(F.col("tool") != "none")
        .withColumn("_prev", F.lag("tool").over(wo))
        .filter(F.col("_prev").isNotNull())
    )
    return t.groupBy(
        F.col("_prev").alias("src"), F.col("tool").alias("dst")
    ).agg(F.count("*").cast("bigint").alias("weight"))


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damp_pm: int = PR_DAMP_PM,
    scale: int = PR_SCALE,
) -> DataFrame:
    """PageRank over (src, dst, weight) edges; returns
    (node, out_weight, pr) with pr in `scale` fixed-point units.
    Nodes = every src or dst.  N (node count) is the one driver
    scalar; everything else stays distributed per the module
    docstring."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outw = edges.groupBy("src").agg(
        F.sum("weight").cast("bigint").alias("outw")
    )
    en = edges.join(outw, "src").persist()
    nodes = nodes.persist()
    n = nodes.count()
    base = scale // n
    tele = ((1000 - damp_pm) * base) // 1000
    pr = nodes.withColumn("pr", F.lit(base).cast("bigint"))
    for _ in range(n_iter):
        contrib = (
            pr.join(en, pr["node"] == en["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("(pr * weight) DIV outw").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("bigint").alias("c"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(tele)
                + F.expr(
                    f"({damp_pm} * coalesce(c, 0L)) DIV 1000"
                )
            )
            .cast("bigint")
            .alias("pr"),
        )
    out = pr.join(outw, pr["node"] == outw["src"], "left").select(
        "node",
        F.coalesce("outw", F.lit(0)).cast("bigint").alias("out_weight"),
        "pr",
    )
    return out


def pagerank_oracle_cte(
    edges_rel: str,
    n_iter: int = 3,
    damp_pm: int = PR_DAMP_PM,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB replay of pagerank() as chained CTEs over an
    `(src, dst, weight)` relation named `edges_rel`.  Appends CTEs
    (caller opens the WITH); final SELECT matches the Spark schema."""
    parts = [
        f"""nd AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM {edges_rel}
    UNION ALL SELECT dst FROM {edges_rel})),
ow AS MATERIALIZED (SELECT src, CAST(sum(weight) AS BIGINT) AS outw
       FROM {edges_rel} GROUP BY 1),
en AS MATERIALIZED (SELECT e.src, e.dst, e.weight, ow.outw
       FROM {edges_rel} e JOIN ow USING (src)),
nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nd),
bs AS MATERIALIZED (SELECT CAST({scale} // n AS BIGINT) AS base,
              CAST(({1000 - damp_pm} * ({scale} // n)) // 1000
                   AS BIGINT) AS tele
       FROM nn),
p0 AS MATERIALIZED (SELECT node, (SELECT base FROM bs) AS pr FROM nd)"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"""c{t} AS MATERIALIZED (
  SELECT en.dst AS node,
         CAST(sum((p.pr * en.weight) // en.outw) AS BIGINT) AS c
  FROM en JOIN p{t - 1} p ON p.node = en.src GROUP BY 1),
p{t} AS MATERIALIZED (
  SELECT nd.node,
         CAST((SELECT tele FROM bs)
              + ({damp_pm} * COALESCE(c{t}.c, 0)) // 1000
              AS BIGINT) AS pr
  FROM nd LEFT JOIN c{t} USING (node))"""
        )
    fin = f"""SELECT nd.node AS node,
       COALESCE(ow.outw, 0) AS out_weight, p{n_iter}.pr AS pr
FROM nd LEFT JOIN ow ON ow.src = nd.node
        JOIN p{n_iter} USING (node)"""
    return ",\n".join(parts) + "\n" + fin


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph of
    `edges` (self-loops dropped, weights/directions collapsed) — the
    clustering-structure primitive of graph-based corpus curation
    (spam-farm detection in link graphs, community density).

    Degree orientation (the classic distributed-triangle bound): each
    undirected edge is oriented from its lower-(degree, node) endpoint
    to the higher one, so every node's out-degree is O(sqrt(m)) and
    the wedge join's candidate volume is sum(out_deg^2) = O(m^1.5) —
    never the naive sum(deg^2) that a hub node would explode.  Wedges
    (u -> v, u -> w) close against the undirected edge set on the
    (v, w) key.  Three equi-joins total, all key-partitioned; the
    DuckDB oracle counts triangles INDEPENDENTLY (direct a < b < c
    triple join), so hash equality cross-validates the orientation
    algorithm.

    Output: (node, n_triangles) for nodes in at least one triangle."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    e = und.join(da, "a").join(db, "b")
    low_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = e.select(
        F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    x = o.alias("x")
    y = o.alias("y")
    wedges = x.join(
        y,
        (F.col("x.u") == F.col("y.u")) & (F.col("x.v") < F.col("y.v")),
    ).select(
        F.col("x.u").alias("u"),
        F.col("x.v").alias("v"),
        F.col("y.v").alias("w"),
    )
    tri = wedges.join(
        und,
        (F.col("v") == F.col("a")) & (F.col("w") == F.col("b")),
    ).select("u", "v", "w")
    return (
        tri.select(
            F.explode(F.array("u", "v", "w")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )

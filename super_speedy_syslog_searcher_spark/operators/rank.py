"""Bradley-Terry preference-strength fitting — the rating step of
RLHF data curation: given pairwise (winner, loser) outcomes between
rollout policies / model variants (the preference_pairs output, or a
reward-model judge), fit a strength w_i per player such that
P(i beats j) = w_i / (w_i + w_j), via the classic
minorization-maximization update (Hunter 2004):

    w_i' = W_i / sum_j g_ij / (w_i + w_j)

where W_i = total wins of i and g_ij = games between i and j.

Everything is FIXED-POINT integer arithmetic (2^20 scale, truncating
division) like operators/cluster.py's k-means: float MM is
order-of-summation nondeterministic on a distributed reduce, the
integer form is bit-reproducible across runs AND engines — so the
iterative fit gets a full hash oracle (DuckDB replays the identical
iterations as chained CTEs, bt_oracle_cte below mirrors them).

Scale shape: the corpus-sized work is building the outcomes table
(pairwise_outcomes: a self-join WITHIN prompt groups, bounded by the
rollout fan-out n, never corpus x corpus) and the one groupBy(winner,
loser) win-matrix aggregate (map-side combined).  The MM loop then
runs on the k x k win matrix where k = number of PLAYERS (model
variants — dozens, not documents), the same driver-scale-loop shape
as operators/bpe.py's merge training.  At 10^12 turns the matrix is
still k x k.

Reference parity: s4 has no ranking; this is a training-data op
(SURVEY.md LLM-pipeline section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BT_SCALE = 1 << 20


def pairwise_outcomes(scored: DataFrame) -> DataFrame:
    """(prompt_key, winner, loser) for every unordered pair of
    players whose scores differ within a prompt group.  The self-join
    is keyed on prompt_key and bounded by the per-prompt rollout
    fan-out (a few rows per group), so candidate volume is linear in
    the number of groups."""
    a = scored.select(
        "prompt_key",
        F.col("player").alias("pa"),
        F.col("score").alias("sa"),
    )
    b = scored.select(
        "prompt_key",
        F.col("player").alias("pb"),
        F.col("score").alias("sb"),
    )
    return (
        a.join(b, "prompt_key")
        .filter((F.col("pa") < F.col("pb")) & (F.col("sa") != F.col("sb")))
        .select(
            "prompt_key",
            F.when(F.col("sa") > F.col("sb"), F.col("pa"))
            .otherwise(F.col("pb"))
            .alias("winner"),
            F.when(F.col("sa") > F.col("sb"), F.col("pb"))
            .otherwise(F.col("pa"))
            .alias("loser"),
        )
    )


def bradley_terry(
    outcomes: DataFrame, n_iter: int = 6, scale: int = BT_SCALE
) -> DataFrame:
    """Fit BT strengths from an (winner, loser) outcomes relation.

    Returns (player, n_wins, n_games, rating) where rating is the
    final fixed-point strength (scale units, normalized so ratings
    sum to ~k*scale).  Deterministic: every update is

        d_i = sum_j (g_ij * scale^2) DIV (w_i + w_j)
        u_i = max(1, (W_i * scale^2) DIV d_i)
        w_i = max(1, (u_i * k * scale) DIV sum_j u_j)

    with truncating integer division (Spark DIV / DuckDB // on the
    positive values involved), identical in the DuckDB oracle replay.

    Win-matrix aggregation is the only corpus pass; the collect is
    k^2-bounded (players are model variants, not documents)."""
    wins = [
        (r["winner"], r["loser"], int(r["n"]))
        for r in outcomes.groupBy("winner", "loser")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    players = sorted({w for w, _, _ in wins} | {l for _, l, _ in wins})
    k = len(players)
    g: dict[tuple[str, str], int] = {}
    wtot: dict[str, int] = {p: 0 for p in players}
    gtot: dict[str, int] = {p: 0 for p in players}
    for w, l, n in wins:
        g[(w, l)] = g.get((w, l), 0) + n
        g[(l, w)] = g.get((l, w), 0) + n
        wtot[w] += n
        gtot[w] += n
        gtot[l] += n
    s2 = scale * scale
    w = {p: scale for p in players}
    for _ in range(n_iter):
        d = {
            p: sum(
                (n * s2) // (w[p] + w[q])
                for (a, q), n in g.items()
                if a == p
            )
            for p in players
        }
        u = {
            p: max(1, (wtot[p] * s2) // d[p]) if d[p] > 0 else w[p]
            for p in players
        }
        tot = sum(u.values())
        w = {p: max(1, (u[p] * k * scale) // tot) for p in players}
    spark = outcomes.sparkSession
    return spark.createDataFrame(
        [(p, wtot[p], gtot[p], w[p]) for p in players],
        "player string, n_wins long, n_games long, rating long",
    )


def bt_oracle_cte(
    outcomes_rel: str, n_iter: int = 6, scale: int = BT_SCALE
) -> str:
    """DuckDB replay of bradley_terry as chained CTEs over an
    `(winner, loser)` relation named `outcomes_rel`.  Appends CTEs
    (callers open the WITH); final SELECT matches the Spark schema."""
    s2 = scale * scale
    parts = [
        f"""wm AS MATERIALIZED (
  SELECT winner, loser, CAST(count(*) AS BIGINT) AS n
  FROM {outcomes_rel} GROUP BY 1, 2),
gm AS MATERIALIZED (
  SELECT a, b, CAST(sum(n) AS BIGINT) AS n FROM (
    SELECT winner AS a, loser AS b, n FROM wm
    UNION ALL SELECT loser, winner, n FROM wm) GROUP BY 1, 2),
pl AS MATERIALIZED (SELECT DISTINCT a AS player FROM gm),
kk AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS k FROM pl),
tw AS MATERIALIZED (SELECT winner AS player, CAST(sum(n) AS BIGINT) AS wn
       FROM wm GROUP BY 1),
tg AS MATERIALIZED (SELECT a AS player, CAST(sum(n) AS BIGINT) AS gn
       FROM gm GROUP BY 1),
w0 AS MATERIALIZED (SELECT player, CAST({scale} AS BIGINT) AS w FROM pl)"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"""d{t} AS MATERIALIZED (
  SELECT gm.a AS player,
         CAST(sum((gm.n * {s2}) // (wa.w + wb.w)) AS BIGINT) AS d
  FROM gm JOIN w{t - 1} wa ON wa.player = gm.a
          JOIN w{t - 1} wb ON wb.player = gm.b
  GROUP BY 1),
u{t} AS MATERIALIZED (
  SELECT p.player,
         GREATEST(1, (COALESCE(tw.wn, 0) * {s2}) // d{t}.d) AS w
  FROM pl p JOIN d{t} USING (player) LEFT JOIN tw USING (player)),
w{t} AS MATERIALIZED (
  SELECT player,
         GREATEST(1, (w * (SELECT k FROM kk) * {scale})
                  // (SELECT sum(w) FROM u{t})) AS w
  FROM u{t})"""
        )
    fin = f"""SELECT pl.player AS player,
       COALESCE(tw.wn, 0) AS n_wins, tg.gn AS n_games,
       CAST(w{n_iter}.w AS BIGINT) AS rating
FROM pl LEFT JOIN tw USING (player)
        JOIN tg USING (player) JOIN w{n_iter} USING (player)"""
    return ",\n".join(parts) + "\n" + fin

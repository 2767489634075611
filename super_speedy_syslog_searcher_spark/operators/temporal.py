"""Temporal relational operators over the `events` stream: gap-based
sessionization and as-of (nearest-preceding-row) attachment.

Not in the reference (s4 merges and range-filters by time; it does not
sessionize or join), but first-class for a log/telemetry analytics
engine: "split each user's activity at idle gaps" and "attach the most
recent prior X to every row" are the two canonical time-relational
queries over any event log.

Scale shape (both ops): ONE hash shuffle on user_id + one
in-partition sort, shared by every window expression (Catalyst stacks
same-spec windows on a single Exchange+Sort — the PLAN.md repair/
assembly result).  No range join, no per-key loop, no row explosion:
this is the 10^12-row-safe formulation of as-of, vs. the naive
inequality join whose candidate set is quadratic per key.  Skewed
users are bounded by the same input contract as conversations
(SURVEY §7); AQE skew-split applies to the single Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_MINUTES = 120  # idle gap that opens a new session
FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def sessionize(
    events: DataFrame, gap_minutes: int = GAP_MINUTES
) -> DataFrame:
    """Assign a session_id to every event: a session breaks when the
    gap to the user's previous event exceeds `gap_minutes` (strict >,
    so an exactly-gap-long pause keeps the session).

    session_id = "<user_id>#<running break count>" — deterministic,
    dense per user, stable across engines.  Ties in ts are ordered by
    event_id so the labeling is a total order.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    brk = F.when(
        prev.isNull() | ((us - prev) > gap_minutes * 60_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("_brk", brk)
        .withColumn("_sidx", F.sum("_brk").over(cum))
        .withColumn(
            "session_id",
            F.concat_ws(
                "#",
                F.col("user_id").cast("string"),
                F.col("_sidx").cast("string"),
            ),
        )
        .drop("_brk", "_sidx")
    )


def session_stats(
    events: DataFrame, gap_minutes: int = GAP_MINUTES
) -> DataFrame:
    """One row per session: bounds, size, duration.  The aggregate
    reuses sessionize's user_id partitioning (groupBy key has user_id
    prefix), so AQE coalesces rather than reshuffles."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("session_id", "user_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("bigint").alias("n_events"),
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts))) DIV 1000000"
        ).cast("bigint").alias("duration_s"),
    )


def asof_join_tables(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Two-table as-of join without an inequality join: attach to each
    left row the most recent right row with right.ts <= left.ts for
    the same key (INCLUSIVE at equal ts — DuckDB/kdb ASOF semantics;
    asof_attach's single-table form is strict-row-preceding instead).

    Right must be unique per (key, ts) — pre-aggregate if it is not
    (max_by on a unique id is the deterministic way); with ties the
    attached row would be arbitrary in any engine.

    Shape: tag right rows prio 0 / left rows prio 1, unionByName,
    one window last(value, ignorenulls) over rows ordered by
    (ts, prio) up to the previous row — a right row at the same ts
    sorts before the left row and is therefore visible.  ONE hash
    shuffle on the key, candidate set linear in |L|+|R|; the naive
    `l.ts >= r.ts` join is quadratic per key and is exactly what
    this operator exists to avoid at 10^12 rows.

    Attached columns come back as `asof_<name>` plus `asof_ts`.
    """
    rt = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_prio"),
        F.col(ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    u = left.withColumn("_prio", F.lit(1)).unionByName(
        rt, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_prio")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = u
    for c in right_cols:
        out = out.withColumn(
            f"asof_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    out = out.withColumn(
        "asof_ts", F.last("_r_ts", ignorenulls=True).over(w)
    )
    drops = ["_prio", "_r_ts"] + [f"_r_{c}" for c in right_cols]
    return out.filter(F.col("_prio") == 1).drop(*drops)


def asof_attach(
    events: DataFrame, of_type: str = "purchase"
) -> DataFrame:
    """As-of join expressed as a window: attach to every event the
    value/time of the most recent STRICTLY-preceding event of
    `of_type` for the same user (ties broken by event_id; an
    `of_type` row never matches itself).

    This is the composition path for an operator Spark lacks: the
    union-free single-table form is last(conditional, ignorenulls)
    over ROWS UNBOUNDED PRECEDING..-1.  For two distinct tables the
    same shape applies after a unionByName with a side tag — still one
    shuffle on the join key, never an inequality join.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pv = F.when(F.col("event_type") == of_type, F.col("value"))
    pt = F.when(F.col("event_type") == of_type, F.col("ts"))
    return (
        events.withColumn("asof_value", F.last(pv, ignorenulls=True).over(w))
        .withColumn("asof_ts", F.last(pt, ignorenulls=True).over(w))
        .withColumn(
            "asof_lag_s",
            F.expr(
                "(unix_micros(ts) - unix_micros(asof_ts)) DIV 1000000"
            ).cast("bigint"),
        )
    )


def hourly_uniques(events: DataFrame, p: int = 8) -> DataFrame:
    """Unique users per hour, exact AND sketched side by side: the
    grouped-distinct aggregate every telemetry pipeline runs, with
    the per-group HLL estimate that replaces it at 10^12 rows
    (count(DISTINCT) shuffles every row once per group; the sketch
    caps each group's shuffle at 2^p register rows).  The exact
    column doubles as the per-row accuracy audit."""
    from .sketch import hll_group_distinct

    hr = events.select(
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias(
            "hour"
        ),
        "user_id",
    )
    exact = hr.groupBy("hour").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_uniques")
    )
    est = hll_group_distinct(hr, "hour", "user_id", p).select(
        "hour", F.col("est_distinct").alias("hll_uniques")
    )
    return exact.join(est, "hour")


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Retention-cohort matrix: users grouped by the DATE of their
    first event (the cohort), counted on every later active day as a
    day offset — the telemetry aggregate behind every retention
    curve.  Output (cohort_day, day_offset, n_users); cohort_day is a
    'yyyy-MM-dd' string so both engines hash identically.

    Scale shape: (user, day) activity dedups in one map-side-combined
    groupBy; the cohort day is one user-keyed aggregate joined back on
    the user key (same partitioning, AQE-broadcastable when the user
    table is small); the final cell count is an aggregate over the
    already-distinct (user, day) pairs — count(*), never a
    count(DISTINCT) re-shuffle.  No window, no self-join."""
    ud = (
        events.select(
            "user_id", F.to_date("ts").alias("_d")
        ).distinct()
    )
    cohort = ud.groupBy("user_id").agg(F.min("_d").alias("_c"))
    return (
        ud.join(cohort, "user_id")
        .groupBy(
            F.date_format("_c", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("_d", "_c").cast("int").alias("day_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


def funnel_conversion(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Strict sequential funnel: a user reaches step i when they have
    an event of type steps[i] STRICTLY AFTER the timestamp at which
    they reached step i-1 (first qualifying event each time — the
    classic ordered-funnel semantics, not mere set membership).
    Output one row per step: (step_idx, step, n_users).

    Scale shape: k rounds of (filter -> user-keyed min aggregate ->
    user-keyed join), each a map-side-combined agg plus one
    same-key-partitioned join — no window over the event stream, no
    per-user array collection (per-user event lists are unbounded at
    10^12 rows; these aggregates aren't)."""
    cur = None
    outs = []
    for i, s in enumerate(steps):
        e = events.filter(F.col("event_type") == s).select(
            "user_id", "ts"
        )
        if cur is None:
            cur = e.groupBy("user_id").agg(F.min("ts").alias("_t"))
        else:
            cur = (
                e.join(cur, "user_id")
                .filter(F.col("ts") > F.col("_t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("_t"))
            )
        outs.append(
            cur.agg(
                F.lit(i).cast("int").alias("step_idx"),
                F.lit(s).alias("step"),
                F.count("*").cast("bigint").alias("n_users"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def hourly_forecast(events: DataFrame) -> DataFrame:
    """Seasonal-naive volume forecast — the capacity-planning /
    alert-threshold baseline every log pipeline runs on its own
    routed output: predicted count for (event_type, hour) = the
    actual count 24 hours earlier, with the absolute error alongside
    (the yardstick any fancier model must beat).  Rows emitted only
    where a prior-day counterpart exists.

    Shape: one map-side-combined groupBy on (event_type, hour), then
    a self-join of the HOURLY table on the 24h-shifted key — the join
    is aggregate-sized (types x hours), never event-sized.  All
    integer math.  Output: (event_type, hour, actual, forecast,
    abs_err)."""
    hc = events.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias(
            "hour"
        ),
    ).agg(F.count("*").cast("bigint").alias("actual"))
    prev = hc.select(
        "event_type",
        (F.col("hour") + F.expr("INTERVAL 24 HOURS")).alias("hour"),
        F.col("actual").alias("forecast"),
    )
    return hc.join(prev, ["event_type", "hour"]).select(
        "event_type",
        "hour",
        "actual",
        "forecast",
        F.abs(F.col("actual") - F.col("forecast"))
        .cast("bigint")
        .alias("abs_err"),
    )

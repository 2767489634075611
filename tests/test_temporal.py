"""Gap sessionization + as-of attachment: planted-fixture semantics
(oracle hash equality is covered by tests/test_pipeline_oracle.py)."""

from __future__ import annotations

import datetime as dt

from super_speedy_syslog_searcher_spark.operators import temporal

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = (
    "event_id long, user_id long, ts timestamp, "
    "event_type string, value double"
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _m(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def test_sessionize_gap_split(spark):
    rows = [
        (1, 7, BASE, "view", 1.0),
        (2, 7, _m(30), "click", 2.0),
        (3, 7, _m(30 + 121), "view", 3.0),  # >120 min idle → new session
        (4, 9, BASE, "view", 4.0),
    ]
    out = {
        r["event_id"]: r["session_id"]
        for r in temporal.sessionize(_ev(spark, rows)).collect()
    }
    assert out[1] == out[2] == "7#1"
    assert out[3] == "7#2"
    assert out[4] == "9#1"


def test_sessionize_exact_gap_keeps_session(spark):
    # the break is strict >: a pause of exactly gap_minutes stays
    rows = [(1, 7, BASE, "view", 1.0), (2, 7, _m(120), "view", 2.0)]
    out = temporal.sessionize(_ev(spark, rows)).collect()
    assert {r["session_id"] for r in out} == {"7#1"}


def test_session_stats_bounds_and_duration(spark):
    rows = [
        (1, 7, BASE, "view", 1.0),
        (2, 7, _m(10), "click", 2.0),
        (3, 7, _m(500), "view", 3.0),
    ]
    stats = {
        r["session_id"]: r
        for r in temporal.session_stats(_ev(spark, rows)).collect()
    }
    s1 = stats["7#1"]
    assert s1["n_events"] == 2
    assert s1["duration_s"] == 600
    assert s1["session_start"] == BASE and s1["session_end"] == _m(10)
    assert stats["7#2"]["n_events"] == 1
    assert stats["7#2"]["duration_s"] == 0


def test_asof_attach_strictly_preceding_rows(spark):
    rows = [
        (1, 7, BASE, "purchase", 10.0),
        # same ts, larger event_id: the purchase is a preceding ROW
        (2, 7, BASE, "view", 0.0),
        (3, 7, _m(5), "purchase", 20.0),
        (4, 7, _m(6), "view", 0.0),
        (5, 8, BASE, "view", 0.0),  # user with no purchase at all
    ]
    out = {
        r["event_id"]: r
        for r in temporal.asof_attach(_ev(spark, rows)).collect()
    }
    # a purchase never matches itself (frame ends at the previous row)
    assert out[1]["asof_value"] is None
    # (ts, event_id) tie: same-ts earlier-id purchase IS preceding
    assert out[2]["asof_value"] == 10.0 and out[2]["asof_lag_s"] == 0
    # the second purchase sees the first
    assert out[3]["asof_value"] == 10.0 and out[3]["asof_lag_s"] == 300
    # most-recent wins
    assert out[4]["asof_value"] == 20.0 and out[4]["asof_lag_s"] == 60
    # no cross-user leakage
    assert out[5]["asof_value"] is None and out[5]["asof_ts"] is None


def test_asof_and_sessionize_share_one_shuffle(spark):
    """Both ops are one hash Exchange on user_id: every window
    expression stacks on a single shuffle+sort (the PLAN.md
    stacked-window property), so the as-of is never an inequality
    join."""
    ev = _ev(spark, [(1, 7, BASE, "view", 1.0)])
    for df in (temporal.asof_attach(ev), temporal.sessionize(ev)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchange = plan.count("Exchange hashpartitioning")
        assert n_exchange == 1, plan
        assert "SortMergeJoin" not in plan and "Cartesian" not in plan


def test_asof_join_tables_inclusive_ties_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, 7, BASE), (2, 7, _m(10)), (3, 8, BASE)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        # one right row exactly AT left #1's ts: inclusive → attaches
        [(7, BASE, 10.0), (7, _m(5), 20.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in temporal.asof_join_tables(left, right).collect()
    }
    assert out[1]["asof_value"] == 10.0 and out[1]["asof_ts"] == BASE
    assert out[2]["asof_value"] == 20.0 and out[2]["asof_ts"] == _m(5)
    assert out[3]["asof_value"] is None and out[3]["asof_ts"] is None


def test_asof_join_tables_plan_no_inequality_join(spark):
    left = spark.createDataFrame(
        [(1, 7, BASE)], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, BASE, 1.0)], "user_id long, ts timestamp, value double"
    )
    df = temporal.asof_join_tables(left, right)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Cartesian" not in plan


def test_rate_anomalies_median_and_flag(spark):
    """Planted hour counts: the sink median is the exact rank-
    ceil(n/2) order statistic and only the >3x hour is flagged."""
    import datetime as dtm

    from super_speedy_syslog_searcher_spark.operators.stats import (
        rate_anomalies,
    )

    base = dtm.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    # sink 'a': hourly counts 2, 3, 4, 100 -> median (rank 2 of 4) = 3;
    # 100*1000 > 3000*3 -> anomaly; 4 is not (4000 <= 9000).
    for h, n in enumerate((2, 3, 4, 100)):
        rows += [
            ("a", base + dtm.timedelta(hours=h, minutes=i % 60))
            for i in range(n)
        ]
    # sink 'b': counts 5, 5 -> median = 5, nothing flagged
    for h, n in enumerate((5, 5)):
        rows += [
            ("b", base + dtm.timedelta(hours=h, minutes=i))
            for i in range(n)
        ]
    df = spark.createDataFrame(rows, "sink_eff string, ts_eff timestamp")
    out = rate_anomalies(df).cache()
    got = {
        (r["sink"], r["hour"].hour): (
            r["n_rows"], r["median_rows"], r["is_anomaly"]
        )
        for r in out.collect()
    }
    assert got[("a", 0)] == (2, 3, False)
    assert got[("a", 1)] == (3, 3, False)
    assert got[("a", 2)] == (4, 3, False)
    assert got[("a", 3)] == (100, 3, True)
    assert got[("b", 0)] == (5, 5, False)
    assert got[("b", 1)] == (5, 5, False)
    out.unpersist()


def test_zorder_aligned_quadrant_is_contiguous(spark):
    """The z-order pruning guarantee: an aligned 2^s x 2^s rectangle
    maps to exactly one contiguous zkey range — so a min/max zone map
    on zkey prunes scans filtered on either dimension."""
    from super_speedy_syslog_searcher_spark.operators.layout import (
        zorder_key,
    )

    grid = spark.range(32 * 32).selectExpr(
        "CAST(id % 32 AS LONG) AS x", "CAST(id DIV 32 AS LONG) AS y"
    )
    z = zorder_key(grid, "x", "y", bits=5, n_buckets=16).cache()
    # every aligned 8x8 quadrant (s=3): zkeys form [z0, z0+64)
    for x0 in (0, 8, 16, 24):
        for y0 in (0, 8, 16, 24):
            q = z.filter(
                f"x >= {x0} AND x < {x0 + 8} AND y >= {y0} AND y < {y0 + 8}"
            )
            mn, mx, n = q.selectExpr(
                "min(zkey)", "max(zkey)", "count(*)"
            ).first()
            assert n == 64
            assert mx - mn == 63  # contiguous
    # bijectivity over the grid
    assert z.select("zkey").distinct().count() == 32 * 32
    assert z.filter("zbucket < 0 OR zbucket >= 16").count() == 0
    z.unpersist()


def test_hourly_uniques_exact_vs_sketch(spark):
    """Per-hour sketch estimates track the exact uniques (LC regime:
    tens of users per hour vs 256 buckets), and a single-group sketch
    equals the global hll_distinct on the same rows."""
    from super_speedy_syslog_searcher_spark.operators.sketch import (
        hll_distinct,
    )
    from super_speedy_syslog_searcher_spark.operators.temporal import (
        hourly_uniques,
    )
    from tests.conftest import SF_SMOKE

    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    out = hourly_uniques(ev).cache()
    assert out.count() >= 1
    bad = out.filter(
        "abs(hll_uniques - exact_uniques) > greatest(4, exact_uniques / 4)"
    ).count()
    assert bad == 0  # LC-regime accuracy per group
    # single-group consistency with the global sketch
    hr = out.orderBy("hour").first()["hour"]
    one = ev.filter(
        F.date_trunc("hour", F.col("ts").cast("timestamp")) == hr
    ).select(F.col("user_id").cast("string").alias("v"))
    g = hll_distinct(one, "v").first()["est_distinct"]
    got = out.filter(F.col("hour") == hr).first()["hll_uniques"]
    assert got == g
    out.unpersist()


def _d(days, minutes=0):
    return BASE + dt.timedelta(days=days, minutes=minutes)


def test_funnel_strictly_ordered(spark):
    rows = [
        # u1: full ordered funnel
        (1, 1, _m(0), "signup", 0.0),
        (2, 1, _m(1), "view", 0.0),
        (3, 1, _m(2), "click", 0.0),
        (4, 1, _m(3), "purchase", 0.0),
        # u2: view BEFORE signup only → stops at signup
        (5, 2, _m(0), "view", 0.0),
        (6, 2, _m(1), "signup", 0.0),
        # u3: signup, view, purchase (no click) → stops at view
        (7, 3, _m(0), "signup", 0.0),
        (8, 3, _m(1), "view", 0.0),
        (9, 3, _m(2), "purchase", 0.0),
        # u4: click at the SAME instant as view → strict > excludes it
        (10, 4, _m(0), "signup", 0.0),
        (11, 4, _m(1), "view", 0.0),
        (12, 4, _m(1), "click", 0.0),
    ]
    got = {
        (r["step_idx"], r["step"]): r["n_users"]
        for r in temporal.funnel_conversion(_ev(spark, rows)).collect()
    }
    assert got == {
        (0, "signup"): 4,
        (1, "view"): 3,
        (2, "click"): 1,
        (3, "purchase"): 1,
    }


def test_funnel_retry_after_reset_counts(spark):
    # u5 views pre-signup AND again post-signup: the later view counts
    rows = [
        (1, 5, _m(0), "view", 0.0),
        (2, 5, _m(1), "signup", 0.0),
        (3, 5, _m(2), "view", 0.0),
    ]
    got = {
        r["step"]: r["n_users"]
        for r in temporal.funnel_conversion(_ev(spark, rows)).collect()
    }
    assert got["signup"] == 1 and got["view"] == 1


def test_retention_cohorts_counts_and_dedup(spark):
    rows = [
        # u1: cohort day0, active day0 (twice — dedups) and day2
        (1, 1, _d(0), "view", 0.0),
        (2, 1, _d(0, 30), "click", 0.0),
        (3, 1, _d(2), "view", 0.0),
        # u2: cohort day0, active day0 only
        (4, 2, _d(0), "view", 0.0),
        # u3: cohort day1, active day1 + day2 (offset 1)
        (5, 3, _d(1), "view", 0.0),
        (6, 3, _d(2), "view", 0.0),
    ]
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in temporal.retention_cohorts(_ev(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 1): 1,
    }

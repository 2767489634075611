"""Raw log-file source (text + gz) end-to-end, and physical-plan
assertions (pushdown / broadcast / codegen)."""

from __future__ import annotations

import datetime as dt
import gzip

from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark import pipeline as P
from super_speedy_syslog_searcher_spark import plans
from super_speedy_syslog_searcher_spark.operators.enrich import enrich_stage
from super_speedy_syslog_searcher_spark.sources.logfiles import (
    read_log_files,
)

LOG_A = """2024-01-05T10:00:00 -0800 app start
2024-01-05T10:00:01 -0800 step one
    continuation frame alpha
2024-01-05T10:00:05 -0800 done
"""
LOG_B = """Jan  5 17:59:59 host cron: run
Jan  5 18:00:30 host cron: fin
"""


def test_logfile_source_end_to_end(spark, tmp_path):
    a = tmp_path / "a.log"
    a.write_text(LOG_A)
    bgz = tmp_path / "b.log.gz"
    with gzip.open(bgz, "wt") as f:
        f.write(LOG_B)

    mtimes = {
        f"file://{a}": dt.datetime(2024, 1, 5, 19, 0, 0),
        f"file://{bgz}": dt.datetime(2024, 1, 5, 19, 0, 0),
    }
    src = read_log_files(spark, [str(a), str(bgz)], mtime_map=mtimes)
    assert src.count() == 6

    merged = P.full_merge(src, persist_before_sort=False)
    rows = merged.select("conv_id", "turn_idx", "text", "ts_eff").collect()
    # global datetime order across the two files, tz-normalized:
    # 17:59:59 UTC (b) < 18:00:00 UTC (a, -0800) < ... < 18:00:30 (b)
    texts = [r["text"] for r in rows]
    assert texts[0].endswith("cron: run")
    assert texts[1].endswith("app start")
    assert texts[-1].endswith("cron: fin")
    # continuation line inherits its anchor's timestamp and follows it
    i = texts.index("    continuation frame alpha")
    assert rows[i]["ts_eff"] == rows[i - 1]["ts_eff"]


def test_dt_filter_pushdown_to_parquet(spark, tmp_path):
    """The -a/-b predicate must reach the parquet scan when filtering
    on the native ts column (s4's binary-search analogue)."""
    p = str(tmp_path / "t.parquet")
    spark.range(100).select(
        F.col("id"),
        F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
    ).write.parquet(p)
    df = spark.read.parquet(p).filter(
        F.col("ts") >= F.lit("1970-01-02").cast("timestamp")
    )
    assert plans.has_pushed_filter(df, "ts")


def test_enrich_is_broadcast(spark, duck):
    from super_speedy_syslog_searcher_spark.datagen import transcripts_df

    df = enrich_stage(transcripts_df(spark, "/root/testdata/sf0.001"))
    assert plans.has_broadcast_join(df)


def test_parse_prunes_columns(spark):
    """Selecting only parse outputs must prune the cached/scan columns
    to text (+passthrough keys) — column pruning through the UDF."""
    from super_speedy_syslog_searcher_spark.datagen import transcripts_df
    from super_speedy_syslog_searcher_spark.operators.parse import (
        parse_stage,
    )

    df = parse_stage(
        transcripts_df(spark, "/root/testdata/sf0.001"), scatter=False
    ).select("sink")
    import re

    plan = plans.explain_str(df)
    # one ArrowEvalPython node (formatted explain prints each node in
    # the tree and again in the details section)
    nodes = re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M)
    assert len(nodes) == 1  # UDF evaluated once, not per struct field

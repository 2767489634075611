"""Driver contract for the spark-graft builder (PySpark target).

queries() run the real pipeline (pandas-UDF regex parse, window
repair/assembly, range-partitioned merge); oracle_sql() computes the
same answers in DuckDB *by construction* from the deterministic
transcripts derivation (super_speedy_syslog_searcher_spark.datagen) —
two independent computation paths, the reference's
compare-current-and-expected strategy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark import oracle as O
from super_speedy_syslog_searcher_spark import pipeline as P
from super_speedy_syslog_searcher_spark import session
from super_speedy_syslog_searcher_spark.datagen import transcripts_df
from super_speedy_syslog_searcher_spark.operators import stats
from super_speedy_syslog_searcher_spark.operators.enrich import enrich_stage
from super_speedy_syslog_searcher_spark.operators.merge import (
    dt_filter,
    with_global_seq,
)

DT_AFTER = "2024-01-10 00:00:00"
DT_BEFORE = "2024-01-20 00:00:00"


def _t(spark: SparkSession, sf_dir: str) -> DataFrame:
    session.prep(spark)
    return transcripts_df(spark, sf_dir)


# --------------------------------------------------------------- queries

def q_parse_extract(spark, sf_dir):
    """Pattern-bank datetime extraction + repair (SURVEY §2.2/§2.3)."""
    df = P.parse_repair(_t(spark, sf_dir))
    return df.select(
        "conv_id",
        "turn_idx",
        "ts_parsed",
        F.col("pattern_id").cast("int").alias("pattern_id"),
        "sink",
        F.col("dt_beg").cast("int").alias("dt_beg"),
        F.col("dt_end").cast("int").alias("dt_end"),
    )


def q_merge_ordered(spark, sf_dir):
    """The flagship: dt-filtered globally ordered merge (§2.7)."""
    merged = P.full_merge(_t(spark, sf_dir), DT_AFTER, DT_BEFORE)
    return with_global_seq(merged).select(
        F.col("msg_seq").cast("bigint").alias("msg_seq"),
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "text",
        "ts_eff",
    )


def q_pattern_counts(spark, sf_dir):
    return stats.pattern_counts(P.parse_repair(_t(spark, sf_dir)))


def q_sink_counts(spark, sf_dir):
    return stats.sink_counts(P.assembled(_t(spark, sf_dir)))


def q_hourly_hist(spark, sf_dir):
    return stats.hourly_histogram(P.assembled(_t(spark, sf_dir)))


def q_conv_summary(spark, sf_dir):
    df = stats.conv_summary(P.parse_repair(_t(spark, sf_dir)))
    return df.select(
        "conv_id",
        F.col("turns").cast("bigint").alias("turns"),
        F.col("syslines").cast("bigint").alias("syslines"),
        F.col("longest_line").cast("int").alias("longest_line"),
        "dt_first",
        "dt_last",
        F.col("out_of_order").cast("bigint").alias("out_of_order"),
    )


def q_routed_enriched(spark, sf_dir):
    """Broadcast-dim enrich + per-sink routed tallies (§2.4, route)."""
    df = enrich_stage(P.assembled(_t(spark, sf_dir)))
    return df.groupBy(
        F.col("sink_eff").alias("sink"), "role_kind"
    ).agg(
        F.count("*").cast("bigint").alias("rows"),
        F.sum(F.when(F.col("is_agentic"), 1).otherwise(0))
        .cast("bigint")
        .alias("agentic_rows"),
        F.sum("role_weight").cast("bigint").alias("weight_sum"),
    )


def q_global_summary(spark, sf_dir):
    df = stats.global_summary(P.assembled(_t(spark, sf_dir)))
    return df.select(
        F.col("rows_total").cast("bigint").alias("rows_total"),
        F.col("syslines_total").cast("bigint").alias("syslines_total"),
        F.col("bytes_texts").cast("bigint").alias("bytes_texts"),
        "dt_first",
        "dt_last",
        F.col("convs").cast("bigint").alias("convs"),
    )


def q_sysline_assembly(spark, sf_dir):
    """Continuation-line attachment (§2.6 sysline assembly)."""
    df = P.assembled(_t(spark, sf_dir))
    return (
        df.filter(F.col("msg_turn_idx").isNotNull())
        .groupBy("conv_id", F.col("msg_turn_idx").cast("int").alias("msg_turn_idx"))
        .agg(F.count("*").cast("bigint").alias("lines"))
    )


def q_dt_window_sinks(spark, sf_dir):
    """dt-range filter pushdown + per-sink counts (binary-search
    analogue, §2.7)."""
    df = dt_filter(P.assembled(_t(spark, sf_dir)), DT_AFTER, DT_BEFORE)
    return df.groupBy(F.col("sink_eff").alias("sink")).agg(
        F.count("*").cast("bigint").alias("rows")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: parse → repair →
    assemble → dt-filter → globally ordered merge."""
    return q_merge_ordered(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "parse_extract": q_parse_extract,
        "merge_ordered": q_merge_ordered,
        "pattern_counts": q_pattern_counts,
        "sink_counts": q_sink_counts,
        "hourly_hist": q_hourly_hist,
        "conv_summary": q_conv_summary,
        "routed_enriched": q_routed_enriched,
        "global_summary": q_global_summary,
        "sysline_assembly": q_sysline_assembly,
        "dt_window_sinks": q_dt_window_sinks,
    }


# ---------------------------------------------------------------- oracle

def oracle_sql() -> dict[str, str]:
    b = O.base()
    w = O.with_dims()
    rng = (
        f"ts_eff >= TIMESTAMP '{DT_AFTER}' "
        f"AND ts_eff <= TIMESTAMP '{DT_BEFORE}'"
    )
    return {
        "parse_extract": f"""{b}
SELECT conv_id, turn_idx, _ts_parsed AS ts_parsed, _pattern_id AS pattern_id,
       _sink AS sink, _dt_beg AS dt_beg, _dt_end AS dt_end
FROM exp""",
        "merge_ordered": f"""{b}
SELECT CAST(row_number() OVER (ORDER BY ts_eff, conv_id, turn_idx) AS BIGINT) AS msg_seq,
       conv_id, turn_idx, role, tool, text, ts_eff
FROM asm WHERE {rng}""",
        "pattern_counts": f"""{b}
SELECT _pattern_id AS pattern_id, CAST(count(*) AS BIGINT) AS rows
FROM exp WHERE _pattern_id IS NOT NULL GROUP BY 1""",
        "sink_counts": f"""{b}
SELECT sink_eff AS sink, CAST(count(*) AS BIGINT) AS rows FROM asm GROUP BY 1""",
        "hourly_hist": f"""{b}
SELECT date_trunc('hour', ts_eff) AS hour, CAST(count(*) AS BIGINT) AS rows
FROM asm WHERE ts_eff IS NOT NULL GROUP BY 1""",
        "conv_summary": f"""{b},
oo AS (
  SELECT conv_id, turn_idx, _ts_parsed,
         lag(_ts_parsed) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_ts
  FROM exp WHERE _ts_parsed IS NOT NULL
)
SELECT e.conv_id,
       CAST(count(*) AS BIGINT) AS turns,
       CAST(count(e._ts_parsed) AS BIGINT) AS syslines,
       CAST(max(length(e.text)) AS INT) AS longest_line,
       min(e._ts_parsed) AS dt_first,
       max(e._ts_parsed) AS dt_last,
       CAST(coalesce(o.ooo, 0) AS BIGINT) AS out_of_order
FROM exp e
LEFT JOIN (
  SELECT conv_id, CAST(sum(CASE WHEN _ts_parsed < prev_ts THEN 1 ELSE 0 END) AS BIGINT) AS ooo
  FROM oo GROUP BY conv_id
) o USING (conv_id)
GROUP BY e.conv_id, o.ooo""",
        "routed_enriched": f"""{w}
SELECT a.sink_eff AS sink, r.role_kind,
       CAST(count(*) AS BIGINT) AS rows,
       CAST(sum(CASE WHEN t.is_agentic THEN 1 ELSE 0 END) AS BIGINT) AS agentic_rows,
       CAST(sum(r.role_weight) AS BIGINT) AS weight_sum
FROM asm a
LEFT JOIN dim_role r USING (role)
LEFT JOIN dim_tool t USING (tool)
GROUP BY 1, 2""",
        "global_summary": f"""{b}
SELECT CAST(count(*) AS BIGINT) AS rows_total,
       CAST(count(_ts_parsed) AS BIGINT) AS syslines_total,
       CAST(sum(length(text)) AS BIGINT) AS bytes_texts,
       min(ts_eff) AS dt_first,
       max(ts_eff) AS dt_last,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS convs
FROM asm""",
        "sysline_assembly": f"""{b}
SELECT conv_id, CAST(msg_turn_idx AS INT) AS msg_turn_idx,
       CAST(count(*) AS BIGINT) AS lines
FROM asm WHERE msg_turn_idx IS NOT NULL GROUP BY 1, 2""",
        "dt_window_sinks": f"""{b}
SELECT sink_eff AS sink, CAST(count(*) AS BIGINT) AS rows
FROM asm WHERE {rng} GROUP BY 1""",
    }

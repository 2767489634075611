"""Broadcast-join enrichment against role/tool dimension maps.

s4's analogues are its static lookup tables (named-tz → offset,
month-name → number, applied inside captures_to_buffer_bytes,
src/data/datetime.rs:1368+); the north_rule adds first-class
role/tool dimension enrich.  Dims are tiny → explicit
``F.broadcast`` so the plan is a BroadcastHashJoin with no shuffle of
the fact side — the only join shape that survives a 10^12-row fact
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIM_ROLE = [
    ("user", "human", 1),
    ("assistant", "model", 2),
    ("system", "control", 0),
    ("tool", "machine", 3),
]
DIM_ROLE_SCHEMA = "role string, role_kind string, role_weight int"

DIM_TOOL = [
    ("bash", "shell", True),
    ("search", "retrieval", True),
    ("edit", "fs", True),
    ("python", "code", True),
    ("browser", "web", True),
    ("none", "none", False),
]
DIM_TOOL_SCHEMA = "tool string, tool_group string, is_agentic boolean"


def dim_role_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(DIM_ROLE, DIM_ROLE_SCHEMA)


def dim_tool_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(DIM_TOOL, DIM_TOOL_SCHEMA)


def enrich_stage(df: DataFrame) -> DataFrame:
    """Left broadcast joins; unknown keys keep null attributes."""
    spark = df.sparkSession
    return df.join(F.broadcast(dim_role_df(spark)), "role", "left").join(
        F.broadcast(dim_tool_df(spark)), "tool", "left"
    )


def dims_values_sql() -> str:
    """The same dims as SQL VALUES CTEs (for the DuckDB oracle)."""
    role_rows = ", ".join(f"('{r}', '{k}', {w})" for r, k, w in DIM_ROLE)
    tool_rows = ", ".join(
        f"('{t}', '{g}', {str(a).upper()})" for t, g, a in DIM_TOOL
    )
    return (
        f"dim_role(role, role_kind, role_weight) AS (VALUES {role_rows}), "
        f"dim_tool(tool, tool_group, is_agentic) AS (VALUES {tool_rows})"
    )

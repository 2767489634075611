"""DuckDB oracle SQL builders.

The oracle never regex-parses: datagen.expected_sql exposes the
by-construction parse results, so each oracle query is the *semantic
definition* of a pipeline stage — a genuinely independent computation
path from the Spark UDF/window implementation (differential testing,
the reference's compare-current-and-expected strategy).
"""

from __future__ import annotations

from .datagen import expected_sql
from .operators.enrich import dims_values_sql

# Window assembling continuation lines onto their anchor message
_W = (
    "OVER (PARTITION BY conv_id ORDER BY turn_idx "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)


def assembled_cte(events_rel: str = "events") -> str:
    """CTE chain: exp (expected parse) → asm (assembly semantics)."""
    return f"""
exp AS ({expected_sql('duckdb', events_rel)}),
asm AS (
  SELECT *,
    last_value(_ts_parsed IGNORE NULLS) {_W} AS ts_eff,
    last_value(CASE WHEN _ts_parsed IS NOT NULL THEN turn_idx END IGNORE NULLS) {_W} AS msg_turn_idx,
    coalesce(last_value(CASE WHEN _ts_parsed IS NOT NULL THEN _sink END IGNORE NULLS) {_W},
             'continuation') AS sink_eff
  FROM exp
)"""


def with_dims(events_rel: str = "events") -> str:
    return f"WITH {dims_values_sql()}, {assembled_cte(events_rel)[1:]}"


def base(events_rel: str = "events") -> str:
    return "WITH " + assembled_cte(events_rel).strip()

"""End-to-end pipeline composition (SURVEY.md §3 lifecycle).

scan → parse (pandas-UDF bank) → repair (uptime/year) → assemble
(continuation attach) → enrich (broadcast dims) → dt-filter → merge
(range-partitioned global sort) — the Spark expression of s4's
processing_loop (src/s4/s4.rs:5410).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .operators.assemble import assemble_stage
from .operators.enrich import enrich_stage
from .operators.merge import dt_filter, merge_ordered
from .operators.parse import parse_stage
from .operators.repair import repair_stage


def parse_repair(df: DataFrame, anchor_year: int = 2024) -> DataFrame:
    return repair_stage(parse_stage(df, anchor_year=anchor_year))


def assembled(df: DataFrame, anchor_year: int = 2024) -> DataFrame:
    return assemble_stage(parse_repair(df, anchor_year=anchor_year))


def full_merge(
    df: DataFrame,
    after: str | None = None,
    before: str | None = None,
    enrich: bool = False,
    num_partitions: int | None = None,
    persist_before_sort: bool = True,
    staging: list | None = None,
) -> DataFrame:
    """persist_before_sort: a global sort range-partitions by sampling
    its child, which would re-run the parse UDF a second time;
    staging the (already dt-filtered) parse output first trades one
    cheap materialization for a full re-parse.  At 10^12-row scale
    the same role is played by the routed Iceberg sink staging table
    (route.write_routed) — sort from columnar storage, parse once."""
    out = assembled(df)
    if enrich:
        out = enrich_stage(out)
    out = dt_filter(out, after, before)
    if persist_before_sort:
        from pyspark import StorageLevel

        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        if staging is not None:
            staging.append(out)  # caller unpersists after its action
    return merge_ordered(out, num_partitions=num_partitions)

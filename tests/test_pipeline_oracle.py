"""End-to-end: every __spark_entry__ query vs its DuckDB oracle at
sf0.001 — the in-repo mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE, assert_frames_equal

QUERIES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", QUERIES)
def test_query_vs_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = fn(spark, SF_SMOKE).toPandas()
    if sql is None:
        assert len(sdf) >= 0  # rows-only check for non-SQL ops
        return
    odf = duck.sql(sql).df()
    assert_frames_equal(sdf, odf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    seqs = sorted(r["msg_seq"] for r in rows)
    assert seqs == list(range(1, len(rows) + 1))

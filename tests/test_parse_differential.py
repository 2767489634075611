"""Differential: pure-pandas parse core vs the by-construction
expectation over the whole sf0.001 corpus (no Spark needed)."""

from __future__ import annotations

from super_speedy_syslog_searcher_spark.datagen import expected_sql
from super_speedy_syslog_searcher_spark.functions.datetime_parse import (
    parse_series,
)


def test_parse_matches_construction(duck):
    df = duck.sql(expected_sql("duckdb")).df()
    r = parse_series(df["text"]).reset_index(drop=True)

    pid = r["pattern_id"].astype("float")
    pid_exp = df["_pattern_id"].astype("float")
    assert ((pid.isna() & pid_exp.isna()) | (pid == pid_exp)).all()

    # ts for every non-uptime family; uptime rows stay null until repair
    non_up = df["_fam"] != 8
    a = r.loc[non_up, "ts_parsed"]
    b = df.loc[non_up, "_ts_parsed"]
    assert ((a.isna() & b.isna()) | (a == b)).all()
    assert r.loc[~non_up, "uptime_us"].notna().all()

    for col, exp in (("dt_beg", "_dt_beg"), ("dt_end", "_dt_end")):
        x = r[col].astype("float")
        y = df[exp].astype("float")
        assert ((x.isna() & y.isna()) | (x == y)).all(), col

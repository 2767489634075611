"""Driver-contract invariants: every queries() entry has a matching
oracle_sql() entry (the correctness gate compares them pairwise), and
the registry only references callables."""

import __spark_entry__ as m


def test_queries_and_oracles_align():
    q = m.queries()
    o = m.oracle_sql()
    assert set(q) == set(o), (
        f"missing oracles: {set(q) - set(o)}; "
        f"orphan oracles: {set(o) - set(q)}"
    )
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_query_count_floor():
    # 34 as of round 3 — never shrink the driver surface
    assert len(m.queries()) >= 34

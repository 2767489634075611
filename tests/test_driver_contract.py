"""Driver-contract invariants: every queries() entry has a matching
oracle_sql() entry (the correctness gate compares them pairwise), and
the registry only references callables."""

import __spark_entry__ as m

# Queries the driver checks rows-only (documented in each q_* docstring):
# genuinely iterative, non-SQL-expressible semantics.  Keep this list
# SHORT and justified — every other query must carry a full hash oracle.
ROWS_ONLY_OK = {
    # BPE merge training: merge k rewrites the table merge k+1 counts
    # over; equivalence is pinned by tests/test_bpe.py against a naive
    # single-machine trainer on randomized corpora.
    "bpe_train",
}


def test_queries_and_oracles_align():
    q = m.queries()
    o = m.oracle_sql()
    missing = set(q) - set(o)
    assert missing <= ROWS_ONLY_OK, (
        f"missing oracles: {missing - ROWS_ONLY_OK}; "
        f"orphan oracles: {set(o) - set(q)}"
    )
    assert not (set(o) - set(q)), f"orphan oracles: {set(o) - set(q)}"
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_query_count_floor():
    # 34 as of round 3 — never shrink the driver surface
    assert len(m.queries()) >= 34

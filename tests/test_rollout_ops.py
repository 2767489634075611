"""Rollout-corpus operators (prefix tree, best-of-n, preference
pairs): planted-fixture semantics beyond the driver-oracle hash
equality."""

from __future__ import annotations

import datetime as dt

from super_speedy_syslog_searcher_spark.operators import sft

TS = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp"
)


def _turns(spark, rows):
    """rows: (conv_id, turn_idx, role, text)."""
    return spark.createDataFrame(
        [(c, i, r, t, "none", TS) for c, i, r, t in rows], SCHEMA
    )


def _tree_fixture(spark):
    # three rollouts of one prompt: a/b share 2 turns, c shares 1
    return _turns(
        spark,
        [
            ("a", 0, "user", "solve it"),
            ("a", 1, "assistant", "step one"),
            ("a", 2, "assistant", "answer A"),
            ("b", 0, "user", "solve it"),
            ("b", 1, "assistant", "step one"),
            ("b", 2, "assistant", "answer B"),
            ("c", 0, "user", "solve it"),
            ("c", 1, "assistant", "different step"),
        ],
    )


def test_rollout_tree_counts_shared_prefixes(spark):
    nodes = {
        (r["depth"], r["n_convs"], r["n_children"])
        for r in sft.rollout_tree(_tree_fixture(spark)).collect()
    }
    # depth 1: one node shared by all 3 rollouts, 2 distinct children
    assert (1, 3, 2) in nodes
    # depth 2: "step one" node shared by a+b with 2 children; c's
    # divergent node is a leaf
    assert (2, 2, 2) in nodes
    assert (2, 1, 0) in nodes
    # depth 3: two distinct leaf answers
    assert (3, 1, 0) in nodes
    total = sft.rollout_tree(_tree_fixture(spark)).count()
    assert total == 5  # root + (stepone, diffstep) + 2 answers


def test_rollout_tree_dedup_ledger(spark):
    # sum(n_convs - 1) over nodes = duplicated prefix copies a flat
    # store would hold: depth1 saves 2, depth2 saves 1
    rows = sft.rollout_tree(_tree_fixture(spark)).collect()
    assert sum(r["n_convs"] - 1 for r in rows) == 3


def _scored_fixture(spark):
    # two prompt groups; group "solve it": scores c1=10, c2=6, c3=10
    return _turns(
        spark,
        [
            ("c1", 0, "user", "solve it"),
            ("c1", 1, "assistant", "x" * 10),
            ("c2", 0, "user", "solve it"),
            ("c2", 1, "assistant", "y" * 6),
            ("c3", 0, "user", "solve it"),
            ("c3", 1, "assistant", "z" * 10),
            ("d1", 0, "user", "other prompt"),
            ("d1", 1, "assistant", "w" * 4),
        ],
    )


def test_best_of_n_picks_max_score_min_conv(spark):
    out = {
        r["best_conv"]: r
        for r in sft.best_of_n(_scored_fixture(spark)).collect()
    }
    # c1 and c3 tie at 10 -> smallest conv_id wins
    assert "c1" in out and out["c1"]["n_rollouts"] == 3
    assert out["c1"]["best_score"] == 10
    assert "d1" in out and out["d1"]["n_rollouts"] == 1


def test_preference_pairs_margin_and_singletons(spark):
    out = sft.preference_pairs(_scored_fixture(spark)).collect()
    # only the "solve it" group has differing scores; d1 is singleton
    assert len(out) == 1
    r = out[0]
    assert r["chosen_conv"] == "c1"  # tie-break: conv asc at max
    assert r["rejected_conv"] == "c2"
    assert r["margin"] == 4


def test_preference_pairs_all_tied_group_emits_nothing(spark):
    t = _turns(
        spark,
        [
            ("e1", 0, "user", "p"),
            ("e1", 1, "assistant", "aa"),
            ("e2", 0, "user", "p"),
            ("e2", 1, "assistant", "bb"),
        ],
    )
    assert sft.preference_pairs(t).count() == 0

"""BPE tokenizer-training operator tests.

Pins the distributed trainer (word-count reduction + driver-scale merge
loop, operators/bpe.py) against a naive single-machine reference that
works directly on the raw corpus, plus greedy-encode invariants.

Reference parity note: s4 has no tokenizer; this is a training-data
op (SURVEY.md LLM-pipeline section).  The merge-selection tie-break
(max count, then lexicographically smallest pair) matches the operator
docstring and makes every assertion deterministic.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from super_speedy_syslog_searcher_spark.operators import bpe


# ------------------------------------------------------------ naive ref
def _naive_train(texts, n_merges):
    """Single-machine BPE trainer over the RAW corpus (no word-count
    reduction) — Sennrich et al. 2016 without the </w> marker, same
    deviation the operator documents."""
    seqs = []
    for t in texts:
        for tok in t.split(" "):
            if tok:
                seqs.append(list(tok))
    merges = []
    for rank in range(n_merges):
        counts = Counter()
        for sym in seqs:
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        (left, right), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, n))
        seqs = [bpe._merge_seq(s, left, right) for s in seqs]
    return merges


def _rand_texts(rng, n_docs, vocab=("ab", "abc", "bca", "aa", "cab", "bb")):
    out = []
    for _ in range(n_docs):
        k = rng.randint(1, 12)
        out.append(" ".join(rng.choice(vocab) for _ in range(k)))
    return out


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


# ------------------------------------------------------------ training
def test_train_random_corpora_match_naive(spark):
    """Randomized equivalence: the distributed trainer (word-frequency
    reduction, then merge loop on the vocab table) selects exactly the
    same merge list, in order, with the same weighted counts, as the
    naive trainer that re-scans every raw token sequence per merge."""
    rng = random.Random(11)
    for trial in range(5):
        texts = _rand_texts(rng, rng.randint(3, 15))
        got = [
            (r["rank"], r["left"], r["right"], r["n"])
            for r in bpe.train_bpe(_docs_df(spark, texts), n_merges=6)
            .orderBy("rank")
            .collect()
        ]
        assert got == _naive_train(texts, 6), f"trial {trial}: {texts}"


def test_train_first_merge_is_max_pair(spark):
    texts = ["aa aa aa ab", "ab aa"]
    m = bpe.train_bpe(_docs_df(spark, texts), n_merges=1).collect()[0]
    # ('a','a') appears 4x weighted (aa x4), ('a','b') 2x.
    assert (m["left"], m["right"], m["n"]) == ("a", "a", 4)


def test_train_stops_when_no_pairs_left(spark):
    # Single-char tokens only: zero adjacent pairs, zero merges.
    df = _docs_df(spark, ["a b c", "a a"])
    assert bpe.train_bpe(df, n_merges=4).count() == 0


def test_train_top_v_cap_is_deterministic(spark):
    """top_v caps the vocab table by (count desc, token) — dropping the
    tail changes counts but never nondeterministically."""
    texts = ["aa aa zz", "aa yy zz"]
    a = bpe.train_bpe(_docs_df(spark, texts), n_merges=2, top_v=2).collect()
    b = bpe.train_bpe(_docs_df(spark, texts), n_merges=2, top_v=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # cap keeps aa (cnt 2) and yy (tie at 1, lexicographically < zz)
    first = sorted(map(tuple, a))[0]
    assert (first[1], first[2]) == ("a", "a")


# ------------------------------------------------------------ pair stats
def test_pair_counts_match_brute_force(spark):
    rng = random.Random(5)
    texts = _rand_texts(rng, 10)
    got = {
        r["pair"]: r["n"]
        for r in bpe.pair_counts(_docs_df(spark, texts)).collect()
    }
    want = Counter()
    for t in texts:
        for tok in t.split(" "):
            for i in range(len(tok) - 1):
                want[tok[i : i + 2]] += 1
    assert got == dict(want)


# ------------------------------------------------------------ encoding
def test_encode_roundtrip_and_counts(spark):
    """Symbol concatenation restores the original text; n_bpe shrinks
    monotonically vs character count and never below n_tokens."""
    rng = random.Random(3)
    texts = _rand_texts(rng, 8)
    df = _docs_df(spark, texts)
    merges = bpe.train_bpe(df, n_merges=4)
    rows = {r["doc_id"]: r for r in bpe.encode_bpe(df, merges).collect()}
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x]
        r = rows[i]
        assert r["n_tokens"] == len(toks)
        assert r["bpe_text"].replace(" ", "") == t.replace(" ", "")
        n_chars = sum(len(x) for x in toks)
        assert len(toks) <= r["n_bpe"] <= n_chars


def test_encode_zero_merges_is_characters(spark):
    df = _docs_df(spark, ["abc de"])
    merges = bpe.train_bpe(df, n_merges=0)
    r = bpe.encode_bpe(df, merges).collect()[0]
    assert r["bpe_text"] == "a b c d e"
    assert r["n_bpe"] == 5


def test_encode_greedy_rank_order():
    """Greedy encode merges the LOWEST-rank pair first even when a
    higher-rank pair appears earlier in the token (GPT-2 semantics)."""
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert bpe._encode_token("abc", ranks) == ["a", "bc"]
    # and rank-0 merge can enable the rank-1 merge's absence
    ranks2 = {("a", "b"): 0, ("ab", "c"): 1}
    assert bpe._encode_token("abc", ranks2) == ["abc"]


# ------------------------------------------------------------ plan shape
def test_word_counts_plan_partial_aggregate(spark):
    """The one corpus-wide pass is a hash aggregate with a map-side
    partial (HashAggregate appears above AND below the Exchange)."""
    df = _docs_df(spark, ["aa bb", "aa"])
    plan = bpe.word_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_sf_smoke_train_is_stable(spark):
    """Merge list at sf0.001 is identical across two runs (determinism
    gate for the driver's rows-only bpe_train check)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = bpe.train_bpe(docs, n_merges=8).orderBy("rank").collect()
    b = bpe.train_bpe(docs, n_merges=8).orderBy("rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 8


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])

"""Training-example transforms: GRPO advantages, loss-mask spans,
role-alternation hygiene, FIM splits, token-budget sampling —
planted-fixture semantics beyond the driver-oracle hash equality."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark.operators import sft, sketch
from super_speedy_syslog_searcher_spark.operators import transforms as T

TS = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp"
)


def _turns(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, "none", TS) for c, i, r, t in rows], SCHEMA
    )


def _docs(spark, rows):
    """rows: (doc_id, text, source)."""
    return spark.createDataFrame(
        [(d, t, "en", s, len(t)) for d, t, s in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )


# ------------------------------------------------------- grpo_advantage

def test_grpo_advantage_centering_and_truncation(spark):
    # one prompt group: scores 10, 4, 3 (sum 17, n 3)
    rows = [
        ("a", 0, "user", "p"),
        ("a", 1, "assistant", "x" * 10),
        ("b", 0, "user", "p"),
        ("b", 1, "assistant", "x" * 4),
        ("c", 0, "user", "p"),
        ("c", 1, "assistant", "x" * 3),
    ]
    out = {
        r["conv_id"]: (r["n_rollouts"], r["adv_permille"])
        for r in sft.grpo_advantage(_turns(spark, rows)).collect()
    }
    # adv = (1000*(3*score - 17)) DIV 3, truncating toward zero
    assert out["a"] == (3, (1000 * (30 - 17)) // 3)  # positive: 4333
    assert out["b"] == (3, -1666)  # truncation; floor would give -1667
    assert out["c"] == (3, -2666)


def test_grpo_singleton_group_scores_zero(spark):
    rows = [("solo", 0, "user", "q"), ("solo", 1, "assistant", "abc")]
    (r,) = sft.grpo_advantage(_turns(spark, rows)).collect()
    assert r["n_rollouts"] == 1 and r["adv_permille"] == 0


# ------------------------------------------------------ loss_mask_spans

def test_loss_mask_spans_offsets(spark):
    rows = [
        ("a", 0, "user", "hi"),        # "user: hi\n"       len 9
        ("a", 1, "assistant", "yo!"),  # "assistant: yo!\n" starts at 9
        ("a", 2, "user", "more"),
        ("a", 3, "assistant", "k"),
    ]
    out = {
        r["turn_idx"]: (r["span_start"], r["span_end"])
        for r in sft.loss_mask_spans(_turns(spark, rows)).collect()
    }
    rendered = "user: hi\nassistant: yo!\nuser: more\nassistant: k\n"
    assert set(out) == {1, 3}
    for idx, text in ((1, "yo!"), (3, "k")):
        s, e = out[idx]
        assert rendered[s:e] == text


# ----------------------------------------------------- role_alternation

def test_role_alternation_verdicts(spark):
    rows = [
        # clean dialogue
        ("ok", 0, "user", "q"),
        ("ok", 1, "assistant", "a"),
        ("ok", 2, "user", "q2"),
        ("ok", 3, "assistant", "a2"),
        # adjacent dup + ends on user
        ("bad", 0, "user", "q"),
        ("bad", 1, "assistant", "a"),
        ("bad", 2, "assistant", "a again"),
        ("bad", 3, "user", "dangling"),
        # starts with system
        ("sys", 0, "system", "be nice"),
        ("sys", 1, "user", "q"),
        ("sys", 2, "assistant", "a"),
    ]
    out = {
        r["conv_id"]: r
        for r in sft.role_alternation(_turns(spark, rows)).collect()
    }
    assert out["ok"]["alternation_ok"] is True
    assert out["ok"]["n_adjacent_dups"] == 0
    assert out["bad"]["alternation_ok"] is False
    assert out["bad"]["n_adjacent_dups"] == 1
    assert out["bad"]["last_role"] == "user"
    assert out["sys"]["alternation_ok"] is False
    assert out["sys"]["first_role"] == "system"


# ------------------------------------------------------------ fim_split

def test_fim_split_reassembles_and_bounds(spark):
    rows = [(i, f"document number {i} with some text.", "src0")
            for i in range(20)]
    docs = _docs(spark, rows)
    for r in T.fim_split(docs).collect():
        text = rows[r["doc_id"]][1]
        n = len(text)
        c1, c2 = r["cut1"], r["cut2"]
        assert 1 <= c1 < c2 <= n - 1
        pre, mid, suf = text[:c1], text[c1:c2], text[c2:]
        assert pre and mid and suf
        assert r["fim_text"] == f"<PRE>{pre}<SUF>{suf}<MID>{mid}"


def test_fim_split_drops_short_docs_and_is_narrow(spark):
    docs = _docs(spark, [(0, "ab", "s"), (1, "abc", "s")])
    out = T.fim_split(docs).collect()
    assert [r["doc_id"] for r in out] == [1]
    plan = (
        T.fim_split(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure narrow map


# -------------------------------------------------- token_budget_sample

def test_token_budget_fills_quota_in_hash_order(spark):
    # 6 docs of 10 whitespace tokens each; budget 35 -> first 3 in
    # hash order (cum 10, 20, 30; the 4th would hit 40 > 35)
    rows = [(i, " ".join(["w"] * 10), "s") for i in range(6)]
    out = sketch.token_budget_sample(
        _docs(spark, rows), {"s": 35}
    ).collect()
    assert len(out) == 3
    assert max(r["cum_tokens"] for r in out) == 30
    # deterministic: same call, same picks
    again = sketch.token_budget_sample(
        _docs(spark, rows), {"s": 35}
    ).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in again}


def test_token_budget_first_doc_kept_and_zero_budget(spark):
    rows = [(1, "one two three", "tiny"), (2, "a b c d", "zero")]
    out = sketch.token_budget_sample(
        _docs(spark, rows), {"tiny": 1, "zero": 0}
    ).collect()
    # budget 1 < 3 tokens: the first doc is still granted
    assert [(r["doc_id"], r["source"]) for r in out] == [(1, "tiny")]


def test_token_budget_unknown_source_dropped(spark):
    rows = [(1, "a b", "known"), (2, "a b", "unknown")]
    out = sketch.token_budget_sample(
        _docs(spark, rows), {"known": 100}
    ).collect()
    assert [r["doc_id"] for r in out] == [1]


# ------------------------------------------------------------- pack_sft

def _render(rows, conv):
    return "".join(
        f"{r}: {t}\n" for c, i, r, t in rows if c == conv
    )


def test_pack_sft_spans_point_at_assistant_text(spark):
    rows = [
        ("a", 0, "user", "hello"),
        ("a", 1, "assistant", "world"),
        ("b", 0, "user", "q"),
        ("b", 1, "assistant", "ans"),
        ("c", 0, "user", "xx"),
        ("c", 1, "assistant", "yy"),
    ]
    cap = 30  # conv 'a' is 'user: hello\nassistant: world\n' = 29
    out = sft.pack_sft(_turns(spark, rows), capacity=cap).collect()
    # rebuild each pack's text from conv order and check spans
    packs = {}
    convs = sorted({c for c, *_ in rows})
    cum = 0
    for c in convs:
        txt = _render(rows, c)
        packs.setdefault(cum // cap, []).append((c, txt))
        cum += len(txt)
    rendered = {p: "".join(t for _, t in v) for p, v in packs.items()}
    assert out
    for r in out:
        body = rendered[r["pack_id"]]
        turn_text = next(
            t for c, i, _, t in rows
            if c == r["conv_id"] and i == r["turn_idx"]
        )
        assert body[r["span_start"]:r["span_end"]] == turn_text


def test_pack_sft_never_splits_a_conversation(spark):
    rows = []
    for k in range(12):
        rows.append((f"c{k:02d}", 0, "user", "u" * (3 + k)))
        rows.append((f"c{k:02d}", 1, "assistant", "a" * (5 + 2 * k)))
    out = sft.pack_sft(_turns(spark, rows), capacity=60).collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r["conv_id"], set()).add(r["pack_id"])
    assert all(len(v) == 1 for v in by_conv.values())
    assert len({p for v in by_conv.values() for p in v}) > 1


def test_pack_sft_plan_has_no_single_partition_exchange(spark):
    plan = (
        sft.pack_sft(_turns(spark, [("a", 0, "assistant", "x")]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_response_latency_known_values(spark):
    """Hand-built conversations: pair latencies {10, 20, 30} ->
    p50 = 20 (rank 2 of 3), p90/p99 = 30; an intervening-user pair
    contributes nothing."""
    import datetime as dtm

    from super_speedy_syslog_searcher_spark.operators.sft import (
        response_latency,
    )

    t0 = dtm.datetime(2024, 1, 1, 0, 0, 0)

    def row(c, i, role, sec):
        return (c, i, role, f"{role} {c}:{i}", "none",
                t0 + dtm.timedelta(seconds=sec))

    rows = [
        # conv a: two clean pairs (10 s, 20 s)
        row("a", 0, "user", 0), row("a", 1, "assistant", 10),
        row("a", 2, "user", 100), row("a", 3, "assistant", 120),
        # conv b: one clean pair (30 s) + an intervening-user miss
        row("b", 0, "user", 0), row("b", 1, "user", 5),
        row("b", 2, "assistant", 35),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    got = {r["q_permille"]: (r["k"], r["value"])
           for r in response_latency(df).collect()}
    assert got[500] == (2, 20)
    assert got[900] == (3, 30)
    assert got[990] == (3, 30)

"""Bradley-Terry rating, PageRank, and group_split: planted-fixture
semantics beyond the driver-oracle hash equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark.operators import graph, rank, sketch

# ------------------------------------------------------------- BT


def _outcomes(spark, rows):
    """rows: (winner, loser) repeated per game."""
    return spark.createDataFrame(
        [(w, l, "g") for w, l in rows], "winner string, loser string, g string"
    ).drop("g")


def test_bt_dominant_player_rates_highest(spark):
    # A beats B 3x, B beats C 3x, A beats C 3x: strict order A > B > C
    rows = [("A", "B")] * 3 + [("B", "C")] * 3 + [("A", "C")] * 3
    r = {
        x["player"]: x
        for x in rank.bradley_terry(_outcomes(spark, rows)).collect()
    }
    assert r["A"]["rating"] > r["B"]["rating"] > r["C"]["rating"]
    assert r["A"]["n_wins"] == 6 and r["C"]["n_wins"] == 0
    assert r["A"]["n_games"] == 6 and r["B"]["n_games"] == 6


def test_bt_symmetric_players_rate_equal(spark):
    # A and B split 4 games 2-2: identical fixed-point ratings
    rows = [("A", "B"), ("A", "B"), ("B", "A"), ("B", "A")]
    r = {
        x["player"]: x["rating"]
        for x in rank.bradley_terry(_outcomes(spark, rows)).collect()
    }
    assert r["A"] == r["B"]


def test_bt_deterministic_across_runs(spark):
    rows = [("A", "B")] * 5 + [("B", "A")] * 2 + [("B", "C")] * 4 + [
        ("C", "A")
    ] * 1
    df = _outcomes(spark, rows)
    a = sorted(map(tuple, rank.bradley_terry(df).collect()))
    b = sorted(map(tuple, rank.bradley_terry(df).collect()))
    assert a == b


def test_pairwise_outcomes_direction_and_bounds(spark):
    scored = spark.createDataFrame(
        [
            ("p1", "base", 10),
            ("p1", "r1", 30),
            ("p1", "r2", 20),
            ("p2", "base", 7),  # singleton group: no pairs
            ("p3", "base", 5),
            ("p3", "r1", 5),  # tie: dropped
        ],
        "prompt_key string, player string, score long",
    )
    got = {
        (r["prompt_key"], r["winner"], r["loser"])
        for r in rank.pairwise_outcomes(scored).collect()
    }
    assert got == {
        ("p1", "r1", "base"),
        ("p1", "r2", "base"),
        ("p1", "r1", "r2"),
    }


# -------------------------------------------------------- PageRank


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src string, dst string, weight long"
    )


def test_pagerank_matches_naive_integer_replay(spark):
    rows = [
        ("a", "b", 2),
        ("a", "c", 1),
        ("b", "c", 1),
        ("c", "a", 1),
        ("d", "a", 3),  # d is a source-only node (gets teleport only)
    ]
    got = {
        r["node"]: (r["out_weight"], r["pr"])
        for r in graph.pagerank(_edges(spark, rows), n_iter=3).collect()
    }

    # naive single-machine replay of the documented integer recipe
    S, D = graph.PR_SCALE, graph.PR_DAMP_PM
    nodes = sorted({s for s, _, _ in rows} | {d for _, d, _ in rows})
    outw = {}
    for s, _, w in rows:
        outw[s] = outw.get(s, 0) + w
    n = len(nodes)
    base = S // n
    tele = ((1000 - D) * base) // 1000
    pr = {v: base for v in nodes}
    for _ in range(3):
        c = {v: 0 for v in nodes}
        for s, d, w in rows:
            c[d] += (pr[s] * w) // outw[s]
        pr = {v: tele + (D * c[v]) // 1000 for v in nodes}
    want = {v: (outw.get(v, 0), pr[v]) for v in nodes}
    assert got == want


def test_pagerank_sink_heavy_node_ranks_highest(spark):
    # everything points at z; z dangles
    rows = [("a", "z", 1), ("b", "z", 1), ("c", "z", 1), ("a", "b", 1)]
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(_edges(spark, rows), n_iter=3).collect()
    }
    assert got["z"] == max(got.values())


def test_tool_edges_skips_none_and_counts(spark):
    rows = [
        ("c1", 0, "user", "t", "none"),
        ("c1", 1, "assistant", "t", "bash"),
        ("c1", 2, "user", "t", "none"),
        ("c1", 3, "assistant", "t", "search"),  # bash -> search
        ("c1", 4, "assistant", "t", "search"),  # search -> search
        ("c2", 5, "assistant", "t", "bash"),  # fresh conv: no edge yet
        ("c2", 6, "assistant", "t", "search"),  # bash -> search
    ]
    df = spark.createDataFrame(
        [(c, i, r, t, tool, None) for c, i, r, t, tool in rows],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in graph.tool_edges(df).collect()
    }
    assert got == {("bash", "search"): 2, ("search", "search"): 1}


# ------------------------------------------------------ group_split


def test_group_split_never_leaks_groups(spark):
    docs = spark.createDataFrame(
        [(i, f"src{i % 7}") for i in range(200)],
        "doc_id long, source string",
    )
    out = sketch.group_split(docs, "source", "doc_id")
    per_group = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in per_group)
    # all three splits reachable given enough groups
    many = spark.createDataFrame(
        [(i, f"s{i}") for i in range(300)], "doc_id long, source string"
    )
    splits = {
        r["split"]
        for r in sketch.group_split(many, "source", "doc_id")
        .select("split")
        .distinct()
        .collect()
    }
    assert splits == {"train", "val", "test"}


def test_group_split_seed_redeals_groups_not_rows(spark):
    docs = spark.createDataFrame(
        [(i, f"src{i % 40}") for i in range(400)],
        "doc_id long, source string",
    )
    a = {
        (r["doc_id"], r["split"])
        for r in sketch.group_split(docs, seed="split1").collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in sketch.group_split(docs, seed="split2").collect()
    }
    assert a != b  # the deal moved
    # within either seed, rows of one source still agree
    for s in (a, b):
        by_doc = dict(s)
        for i in range(400):
            assert by_doc[i] == by_doc[i % 40]


# --------------------------------------------- syslog-style collapse


def test_repeat_collapse_islands(spark):
    from super_speedy_syslog_searcher_spark.operators import stats

    rows = [
        ("c", 0, "boot ok"),
        ("c", 1, "disk full"),
        ("c", 2, "disk full"),
        ("c", 3, "disk full"),
        ("c", 4, "boot ok"),  # same text, NON-adjacent: own island
        ("d", 5, "disk full"),  # other conv: own island
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    got = {
        (r["conv_id"], r["first_turn"], r["last_turn"], r["n_repeats"],
         r["text"])
        for r in stats.repeat_collapse(df).collect()
    }
    assert got == {
        ("c", 0, 0, 1, "boot ok"),
        ("c", 1, 3, 3, "disk full"),
        ("c", 4, 4, 1, "boot ok"),
        ("d", 5, 5, 1, "disk full"),
    }


def test_log_templates_masks_digits_and_ranks(spark):
    from super_speedy_syslog_searcher_spark.operators import stats

    rows = [
        ("c", 0, "pid 101 exited"),
        ("c", 1, "pid 7 exited"),
        ("c", 2, "pid 993 exited"),
        ("c", 3, "link up"),
        ("c", 4, "link up"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    got = [
        (r["template"], r["n_lines"], r["example"])
        for r in stats.log_templates(df, topn=2).collect()
    ]
    assert got == [
        ("pid <n> exited", 3, "pid 101 exited"),
        ("link up", 2, "link up"),
    ]


# -------------------------------------- temperature mix + diversity


def test_temperature_mix_targets_and_flattening(spark):
    import math

    # source skew 400 vs 25: alpha=1/2 flattens 16:1 to 4:1
    docs = spark.createDataFrame(
        [(i, "big" if i < 400 else "small") for i in range(425)],
        "doc_id long, source string",
    )
    out = sketch.temperature_mix(docs, budget=100).collect()
    per = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
    sq = {"big": math.isqrt(400), "small": math.isqrt(25)}
    tot = sum(sq.values())
    assert per["big"] == (100 * sq["big"]) // tot
    assert per["small"] == (100 * sq["small"]) // tot
    # flattened: big/small kept ratio is 4:1, not 16:1
    assert per["big"] == 4 * per["small"]
    # ranks are 1..target per source
    ranks = sorted(
        r["pick_rank"] for r in out if r["source"] == "small"
    )
    assert ranks == list(range(1, per["small"] + 1))


def test_rollout_diversity_collapse_vs_distinct(spark):
    from super_speedy_syslog_searcher_spark.operators import sft as s

    rows = [
        # group 1: two rollouts with IDENTICAL assistant text
        ("a", 0, "user", "p one"),
        ("a", 1, "assistant", "x y z"),
        ("b", 0, "user", "p one"),
        ("b", 1, "assistant", "x y z"),
        # group 2: two rollouts, fully distinct bigrams
        ("c", 0, "user", "p two"),
        ("c", 1, "assistant", "q r s"),
        ("d", 0, "user", "p two"),
        ("d", 1, "assistant", "t u v"),
    ]
    df = spark.createDataFrame(
        [(c, i, r, t, "none", None) for c, i, r, t in rows],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    vals = sorted(
        (
            r["n_rollouts"],
            r["n_bigrams"],
            r["n_distinct"],
            r["distinct_permille"],
        )
        for r in s.rollout_diversity(df).collect()
    )
    assert vals == [(2, 4, 2, 500), (2, 4, 4, 1000)]


# ------------------------------------------------------- plan shapes


def test_group_split_plan_is_narrow(spark):
    """Pure narrow map: no Exchange, no Join in the split plan."""
    from super_speedy_syslog_searcher_spark import plans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plans.explain_str(sketch.group_split(docs))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_pagerank_plan_no_cartesian_per_iteration(spark):
    """Every iteration is an equi-join + partial agg: no cartesian,
    no nested-loop join anywhere in the 3-iteration plan."""
    from super_speedy_syslog_searcher_spark import plans

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 2)], "src string, dst string, weight long"
    )
    plan = plans.explain_str(graph.pagerank(edges, n_iter=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_topk_plan_takeordered_no_global_sort(spark):
    """The ADC top-k must be a TakeOrderedAndProject (per-partition
    heaps), and the scan side must not join anything non-broadcast:
    codes and est are literal lookups."""
    from super_speedy_syslog_searcher_spark import plans
    from super_speedy_syslog_searcher_spark.operators import pq

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = pq.pq_topk(emb, topk=5)
    plan = plans.explain_str(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------ prefix-filter exact join


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en") for i, t in rows],
        "doc_id long, text string, lang string",
    )


def test_prefix_join_exact_at_and_below_threshold(spark):
    from super_speedy_syslog_searcher_spark.operators import dedup

    # 10 words -> 8 shingles; editing the last word changes only
    # the final shingle: shared 7, union 9 -> 777 permille
    base = "a b c d e f g h i j"
    near = "a b c d e f g h i z"
    same = base  # identical: jaccard 1000
    rows = [(1, base), (2, same), (3, near)]
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_permille"]
        for r in dedup.prefix_filter_pairs(_docs(spark, rows)).collect()
    }
    assert got == {(1, 2): 1000}  # near pair (777) below tau=0.8

    # lower tau to 7/10: the near pair now qualifies — completeness
    got2 = {
        (r["doc_a"], r["doc_b"]): r["jaccard_permille"]
        for r in dedup.prefix_filter_pairs(
            _docs(spark, rows), tau_num=7, tau_den=10
        ).collect()
    }
    assert got2 == {(1, 2): 1000, (1, 3): 777, (2, 3): 777}


def test_prefix_join_completeness_vs_direct(spark):
    """Randomized: prefix-filtered results == the direct any-shingle
    exact join at the same threshold (the pigeonhole guarantee)."""
    import random

    from pyspark.sql import functions as F

    from super_speedy_syslog_searcher_spark.operators import dedup

    rng = random.Random(13)
    vocab = [f"w{k}" for k in range(30)]
    rows = []
    for i in range(40):
        n = rng.randint(6, 14)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    docs = _docs(spark, rows)
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard_permille"])
        for r in dedup.prefix_filter_pairs(
            docs, tau_num=1, tau_den=2
        ).collect()
    }
    # direct reference: ngram-style any-shingle join + same verify
    sh = dedup._shingles(docs)
    sz = {r["doc_id"]: r["n"] for r in
          sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    byd = {}
    for r in sh.collect():
        byd.setdefault(r["doc_id"], set()).add(r["shingle"])
    want = set()
    ids = sorted(byd)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(byd[a] & byd[b])
            uni = sz[a] + sz[b] - inter
            if inter and inter * 2 >= uni:
                want.add((a, b, (1000 * inter) // uni))
    assert got == want


# ------------------------------------------------- snapshot apply


def test_snapshot_apply_roundtrip_with_diff(spark):
    from super_speedy_syslog_searcher_spark.operators import transforms

    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three"), (4, "four")],
        "doc_id long, text string",
    )
    upserts = spark.createDataFrame(
        [(2, "two v2"), (9, "nine")], "doc_id long, text string"
    )
    deletes = spark.createDataFrame([(4,)], "doc_id long")
    out = transforms.snapshot_apply(base, upserts, deletes)
    got = {(r["doc_id"], r["text"], r["op"]) for r in out.collect()}
    assert got == {
        (1, "one", "kept"),
        (3, "three", "kept"),
        (2, "two v2", "upserted"),
        (9, "nine", "upserted"),
    }
    # round-trip law: diff(base, applied) classifies exactly the
    # increment
    st = {
        r["doc_id"]: r["status"]
        for r in transforms.corpus_diff(
            base, out.select("doc_id", "text")
        ).collect()
    }
    assert st == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",
        4: "removed",
        9: "added",
    }


def test_triangle_counts_known_graph(spark):
    # K4 on {a,b,c,d} minus edge (c,d): triangles abc, abd only
    rows = [
        ("a", "b", 1), ("a", "c", 1), ("a", "d", 1),
        ("b", "c", 1), ("b", "d", 1),
        ("b", "a", 9),  # reverse duplicate collapses
        ("e", "e", 1),  # self-loop dropped
    ]
    got = {
        (r["node"], r["n_triangles"])
        for r in graph.triangle_counts(_edges(spark, rows)).collect()
    }
    assert got == {("a", 2), ("b", 2), ("c", 1), ("d", 1)}


def test_triangle_counts_matches_naive_on_random_graph(spark):
    import itertools
    import random

    rng = random.Random(19)
    nodes = [f"n{i}" for i in range(12)]
    und = {
        tuple(sorted(p))
        for p in itertools.combinations(nodes, 2)
        if rng.random() < 0.35
    }
    rows = [(a, b, 1) for a, b in und]
    got = {
        (r["node"], r["n_triangles"])
        for r in graph.triangle_counts(_edges(spark, rows)).collect()
    }
    cnt = {}
    for x, y, z in itertools.combinations(sorted(nodes), 3):
        if ((x, y) in und and (y, z) in und and (x, z) in und):
            for v in (x, y, z):
                cnt[v] = cnt.get(v, 0) + 1
    assert got == set(cnt.items())


# ------------------------------------- histogram + forecast baseline


def test_log2_histogram_buckets_and_merge(spark):
    vals = [(0,), (1,), (2,), (3,), (4,), (7,), (8,), (1023,), (1024,)]
    df = spark.createDataFrame(vals, "v long")
    got = {
        r["bucket"]: (r["n"], r["min_v"], r["max_v"])
        for r in sketch.log2_histogram(df, "v").collect()
    }
    assert got == {
        -1: (1, 0, 0),
        0: (1, 1, 1),
        1: (2, 2, 3),
        2: (2, 4, 7),
        3: (1, 8, 8),
        9: (1, 512 + 511, 1023),
        10: (1, 1024, 1024),
    }
    # mergeability: hist(A ∪ B) == per-bucket (sum, min, max) merge
    a = spark.createDataFrame([(i,) for i in range(1, 50)], "v long")
    b = spark.createDataFrame([(i,) for i in range(30, 90)], "v long")
    whole = {
        r["bucket"]: (r["n"], r["min_v"], r["max_v"])
        for r in sketch.log2_histogram(a.unionByName(b), "v").collect()
    }
    ha = {
        r["bucket"]: (r["n"], r["min_v"], r["max_v"])
        for r in sketch.log2_histogram(a, "v").collect()
    }
    hb = {
        r["bucket"]: (r["n"], r["min_v"], r["max_v"])
        for r in sketch.log2_histogram(b, "v").collect()
    }
    merged = {}
    for h in (ha, hb):
        for k, (n, lo, hi) in h.items():
            if k in merged:
                n0, lo0, hi0 = merged[k]
                merged[k] = (n0 + n, min(lo0, lo), max(hi0, hi))
            else:
                merged[k] = (n, lo, hi)
    assert whole == merged


def test_hourly_forecast_seasonal_naive(spark):
    import datetime as dt

    from super_speedy_syslog_searcher_spark.operators import temporal

    d0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # day 1, 10:00 — 3 clicks
        (1, 1, d0, "click", 0.0),
        (2, 1, d0 + dt.timedelta(minutes=5), "click", 0.0),
        (3, 2, d0 + dt.timedelta(minutes=9), "click", 0.0),
        # day 2, 10:00 — 1 click (forecast 3, err 2)
        (4, 1, d0 + dt.timedelta(hours=24), "click", 0.0),
        # day 2, 11:00 — no day-1 counterpart: not emitted
        (5, 1, d0 + dt.timedelta(hours=25), "click", 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp,"
        " event_type string, value double",
    )
    got = [
        (r["hour"], r["actual"], r["forecast"], r["abs_err"])
        for r in temporal.hourly_forecast(df).collect()
    ]
    assert got == [(d0 + dt.timedelta(hours=24), 1, 3, 2)]

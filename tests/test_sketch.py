"""Deterministic sketches: KMV distinct estimator + hash-stratified
sampling (operators/sketch.py)."""

import contextlib
import io

from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark.operators import sketch

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_kmv_estimate_accuracy_and_exact_small(spark):
    # exact below k: 100 distinct values with k=256 → exact count
    small = spark.range(100).select(F.col("id").cast("string").alias("v"))
    r = sketch.kmv_distinct(small, "v", k=256).collect()[0]
    assert r["est_distinct"] == 100 and r["k_used"] == 100

    # estimate above k: 20k distinct, k=256 → within ±20% (KMV stderr
    # ≈ 1/sqrt(k-2) ≈ 6.3%; 20% is > 3σ)
    big = spark.range(20_000).select(F.col("id").cast("string").alias("v"))
    r = sketch.kmv_distinct(big, "v", k=256).collect()[0]
    assert r["k_used"] == 256
    assert 16_000 <= r["est_distinct"] <= 24_000, r["est_distinct"]

    # duplicates don't inflate the estimate
    dup = big.union(big)
    r2 = sketch.kmv_distinct(dup, "v", k=256).collect()[0]
    assert r2["est_distinct"] == r["est_distinct"]


def test_kmv_plan_is_topk_not_full_sort(spark):
    """orderBy().limit(k) must compile to TakeOrderedAndProject
    (per-partition heaps), never a global Sort+Exchange of all
    hashes — the 100 TB shape."""
    big = spark.range(10_000).select(F.col("id").cast("string").alias("v"))
    plan = _plan(sketch.kmv_distinct(big, "v", k=64))
    assert "TakeOrderedAndProject" in plan


def test_stratified_sample_deterministic_and_proportional(spark):
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )
    a = sketch.stratified_sample(docs, "doc_id", pct=10)
    b = sketch.stratified_sample(docs, "doc_id", pct=10)
    ids_a = {r["doc_id"] for r in a.collect()}
    ids_b = {r["doc_id"] for r in b.collect()}
    assert ids_a == ids_b  # reproducible split
    # ~10% overall and per stratum (binomial 3σ bounds)
    assert 800 <= len(ids_a) <= 1200
    per = {
        r["lang"]: r["n"]
        for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in per.items():
        assert 230 <= n <= 440, (lang, n)
    # pct=100 keeps everything; disjointness of complements
    full = sketch.stratified_sample(docs, "doc_id", pct=100)
    assert full.count() == 10_000


def test_stratified_sample_no_shuffle(spark):
    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    plan = _plan(sketch.stratified_sample(docs, "doc_id", pct=10))
    assert "Exchange" not in plan  # pure narrow filter


def test_int_quantiles_exact_order_statistics(spark):
    """value at rank ceil(q*n/1000) over a known distribution,
    including heavy ties."""
    from super_speedy_syslog_searcher_spark.operators import sketch

    vals = [1, 1, 1, 1, 7, 7, 7, 7, 7, 9]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    out = {
        r["q_permille"]: r.asDict()
        for r in sketch.int_quantiles(df, "x").collect()
    }
    assert out[500]["k"] == 5 and out[500]["value"] == 7
    assert out[900]["k"] == 9 and out[900]["value"] == 7
    assert out[990]["k"] == 10 and out[990]["value"] == 9
    # distinct values, no ties: rank maps straight through
    df2 = spark.createDataFrame([(v,) for v in range(1, 11)], "x int")
    out2 = {
        r["q_permille"]: r["value"]
        for r in sketch.int_quantiles(df2, "x").collect()
    }
    assert out2 == {500: 5, 900: 9, 990: 10}


def test_cms_heavy_hitters_guarantee_and_mergeability(spark):
    """CM overcount guarantee (est >= cnt for every token) and sketch
    mergeability: cell-wise SUM of the two half-corpus sketches ==
    the whole-corpus sketch (how a sharded 100 TB build reduces)."""
    from super_speedy_syslog_searcher_spark.operators.sketch import (
        cms_cells,
        cms_heavy_hitters,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    hh = cms_heavy_hitters(docs, d=4, w=1024, denom=500)
    assert hh.filter("est < cnt").count() == 0
    assert hh.count() >= 1

    tok = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    vocab = tok.groupBy("token").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    lo = docs.filter("doc_id % 2 = 0")
    hi = docs.filter("doc_id % 2 = 1")

    def vocab_of(d):
        return (
            d.select(
                F.explode(F.split(F.lower("text"), " ")).alias("token")
            )
            .groupBy("token")
            .agg(F.count("*").cast("bigint").alias("cnt"))
        )

    merged = (
        cms_cells(vocab_of(lo))
        .unionByName(cms_cells(vocab_of(hi)))
        .groupBy("j", "cell")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    whole = cms_cells(vocab)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_registers_merge_and_accuracy(spark):
    """HLL registers merge by element-wise max (shard-and-reduce at
    100 TB); the corrected estimate lands within the expected error
    band in BOTH regimes (linear counting at tiny n, raw HLL at
    large n)."""
    from super_speedy_syslog_searcher_spark.operators.sketch import (
        hll_distinct,
        hll_registers,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ids = docs.select(F.col("doc_id").cast("string").alias("v"))

    lo = ids.filter("CAST(v AS BIGINT) % 2 = 0")
    hi = ids.filter("CAST(v AS BIGINT) % 2 = 1")
    merged = (
        hll_registers(lo, "v")
        .unionByName(hll_registers(hi, "v"))
        .groupBy("bucket")
        .agg(F.max("maxrho").cast("int").alias("maxrho"))
    )
    whole = hll_registers(ids, "v")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0

    # accuracy: docs ids (few hundred -> LC regime at p=8)
    n = ids.distinct().count()
    est = hll_distinct(ids, "v").collect()[0]["est_distinct"]
    assert abs(est - n) <= max(4, int(0.25 * n))

    # raw regime: many distinct values via a derived high-card column
    big = spark.range(20000).select(
        F.md5(F.col("id").cast("string")).alias("v")
    )
    row = hll_distinct(big, "v").collect()[0]
    assert row["est_raw"] == row["est_distinct"]  # no LC at this n
    assert abs(row["est_distinct"] - 20000) <= 0.25 * 20000


def test_bloom_prefilter_no_false_negatives(spark):
    """Every true member passes the bloom (exact => bloom_pass), and
    false_positive is precisely bloom_pass & ~exact."""
    from super_speedy_syslog_searcher_spark.operators.sketch import (
        bloom_prefilter,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    keys = docs.filter("doc_id % 10 = 0").select("text")
    out = bloom_prefilter(docs, keys, mbits=512, k=4).cache()
    assert out.filter("exact AND NOT bloom_pass").count() == 0
    assert out.filter(
        "false_positive != (bloom_pass AND NOT exact)"
    ).count() == 0
    n_keys = keys.distinct().count()
    assert out.filter("exact").count() >= n_keys
    out.unpersist()


def test_bloom_prefilter_false_positives_under_pressure(spark):
    """A deliberately under-sized filter (tiny mbits) produces false
    positives but still never a false negative — the CM-style safety
    property under the worst sizing."""
    from super_speedy_syslog_searcher_spark.operators.sketch import (
        bloom_prefilter,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    keys = docs.filter("doc_id % 3 = 0").select("text")
    out = bloom_prefilter(docs, keys, mbits=64, k=4).cache()
    assert out.filter("exact AND NOT bloom_pass").count() == 0
    assert out.filter("false_positive").count() >= 1
    out.unpersist()


def test_bloom_prefilter_plan_is_narrow(spark):
    """The membership test is a literal-bitmask narrow map: no hash
    shuffle of the candidate side — the only Exchange is the
    broadcast for the exact-audit semi join."""
    from super_speedy_syslog_searcher_spark.operators.sketch import (
        bloom_prefilter,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    keys = docs.filter("doc_id % 10 = 0").select("text")
    plan = _plan(bloom_prefilter(docs, keys, mbits=512, k=4))
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan

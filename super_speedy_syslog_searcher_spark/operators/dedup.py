"""Deduplication suite for training-data pipelines over `documents`.

Not present in the reference (s4 has no dedup), but a first-class
requirement for a 100 TB data pipeline.  Every variant is expressed
with built-in DataFrame ops (no UDFs) so the whole thing stays in
WholeStageCodegen, and every hash is MD5 so the DuckDB oracle can
compute byte-identical values.

Scale notes (10^12 rows):
 * exact        — one hash-aggregate on a digest; map-side combine
 * minhash LSH  — explode shingles (size x K rows) -> per-doc min per
   seed (partial agg) -> band keys -> self-join on band bucket.  The
   band join is the classic near-dup pattern: only same-bucket pairs
   materialize, never the n^2 cross product.
 * n-gram Jaccard — shingle self-join restricted to candidate scope;
   the scale path is lsh_verified_pairs: LSH band candidates feed the
   exact-Jaccard verify, so shingle sets join only per candidate pair
   (shuffle keyed on doc_id) and no shingle×shingle join ever forms.
   The lang-scoped variant remains for small corpora / recall audits.
 * simhash      — 64-bit majority-of-token-hash-bits signature via
   explode + groupBy, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark.operators.sketch import _h13

K_MINHASH = 8
BANDS = 2  # 2 bands x 4 rows
SHINGLE_W = 3


def exact_dups(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by text digest; keeps the smallest
    doc_id as canonical (hash-groupBy dedup)."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("digest"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _shingles(docs: DataFrame, w: int = SHINGLE_W) -> DataFrame:
    """(doc_id, shingle) distinct word w-grams of lowercased text."""
    words = F.split(F.lower(F.col("text")), " ")
    # guard: Spark sequence(1, 0) DESCENDS instead of being empty
    grams = F.expr(
        f"CASE WHEN size(_w) >= {w} THEN "
        f"transform(sequence(1, size(_w) - {w - 1}), "
        f"i -> concat_ws(' ', slice(_w, i, {w}))) "
        f"ELSE array() END"
    )
    return (
        docs.withColumn("_w", words)
        .select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame, k: int = K_MINHASH) -> DataFrame:
    """K minhash values per doc: min over shingles of
    md5(shingle || '#' || seed) — deterministic and engine-portable."""
    sh = _shingles(docs)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(
            f"m{i}"
        )
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, band, bval) LSH band keys; band value = md5(concat of
    the band's minhash rows)."""
    sig = minhash_signatures(docs)
    rows_per_band = K_MINHASH // BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(
                        *[
                            F.col(f"m{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ]
                    )
                ).alias("bval"),
            )
            for b in range(BANDS)
        ]
    )
    return sig.select(
        "doc_id", F.explode(bands).alias("bk")
    ).select("doc_id", "bk.band", "bk.bval")


def minhash_band_pairs(docs: DataFrame) -> DataFrame:
    """LSH candidate pairs: docs sharing any band bucket."""
    buckets = _band_buckets(docs)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.2
) -> DataFrame:
    """Word-3-gram Jaccard over same-lang candidate pairs.
    jaccard = shared / (|A| + |B| - shared); round(4) for the oracle
    hash compare."""
    sh = _shingles(docs).join(docs.select("doc_id", "lang"), "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("shared")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def lsh_verified_pairs(
    docs: DataFrame,
    threshold: float = 0.2,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidates → exact n-gram-Jaccard verification.

    The 100 TB shape: candidate pairs (tiny vs n²) join each side's
    shingle set on doc_id — both joins shuffle on doc keys, never on
    shingle values, so hot shingles cannot form a quadratic join.  A
    candidate pair sharing no shingle simply drops out before the
    threshold filter (jaccard would be 0 — same output).

    candidates defaults to minhash_band_pairs(docs); any (doc_a,
    doc_b) frame works (e.g. simhash-bucket pairs).
    """
    cand = candidates if candidates is not None else minhash_band_pairs(docs)
    sh = _shingles(docs)
    a = sh.withColumnRenamed("doc_id", "doc_a")
    b = sh.withColumnRenamed("doc_id", "doc_b")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    shared = (
        cand.join(a, "doc_a")               # A's shingles per pair
        .join(b, ["doc_b", "shingle"])      # keep those B also has
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("shared")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


_NIBBLE = {c: int(c, 16) for c in "0123456789abcdef"}


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit simhash: bit j is set iff the majority of token md5
    hashes have bit j set.  Engine-portable (the oracle repeats it
    with CASE-mapped nibbles).

    ONE groupBy over the token rows computes all 64 signed bit-sums as
    64 conditional-aggregate columns — the shuffle carries each
    (doc, token) row exactly once.  (Round 2 exploded 16 nibble
    positions first, inflating the shuffled rows 16×; same output.)

    Output: (doc_id, simhash_hex: 16-char lowercase hex)."""
    tokens = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.lower(F.col("text")), " "))
            ).alias("tok"),
        )
        .withColumn("h", F.substring(F.md5("tok"), 1, 16))
    )
    aggs = []
    for p in range(1, 17):  # hex digit position (MSB first)
        nib = F.conv(F.substring(F.col("h"), p, 1), 16, 10).cast("int")
        for b in range(4):
            aggs.append(
                F.sum(
                    F.when(nib.bitwiseAND(1 << b) > 0, 1).otherwise(-1)
                ).alias(f"s_{p}_{b}")
            )
    sums = tokens.groupBy("doc_id").agg(*aggs)
    hex_cols = []
    for p in range(1, 17):
        nibble = sum(
            F.when(F.col(f"s_{p}_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(4)
        )
        hex_cols.append(F.lower(F.conv(nibble.cast("string"), 10, 16)))
    return sums.select("doc_id", F.concat(*hex_cols).alias("simhash_hex"))


DUPSPAN_K = 8


def duplicate_spans(docs: DataFrame, k: int = DUPSPAN_K) -> DataFrame:
    """Corpus-level duplicate-substring removal at token-gram
    granularity — the exact-substring dedup of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better"),
    restricted to whitespace-token k-gram boundaries so it is
    expressible as pure DataFrame ops (the paper's suffix array is a
    single-machine structure; the distributed equivalent is exactly
    this gram-keyed shuffle).

    Any k-token gram occurring more than once in the corpus (across
    docs or repeated within one) marks every token position it covers
    as duplicated; per doc the covered positions merge into maximal
    spans, which are excised from the rebuilt text.  Output one row
    per doc: (doc_id, n_tokens, n_dup_tokens, dup_permille, n_spans,
    clean_text) with dup_permille in integer permille (floor) so no
    float crosses an engine boundary.

    Shape at 10^12 docs:
      * tokens arrive via posexplode; grams are built with k-1 window
        ``lead``s over (doc_id, pos) — ONE hash shuffle on doc_id and
        no per-gram duplication of the token array;
      * the duplicate test is a gram-keyed count (map-side combine)
        joined back on the gram; hot grams (stopword runs) are the
        skew risk — AQE skew-join splits them, and the count side
        never exceeds one row per distinct gram;
      * cover explode, island merge, and text rebuild all re-key on
        doc_id, reusing the first shuffle's partitioning.
    """
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram_cols = [F.col("tok")] + [
        F.lead("tok", j).over(w) for j in range(1, k)
    ]
    grams = (
        tok.withColumn("_last", F.lead("tok", k - 1).over(w))
        .withColumn("gram", F.concat_ws(" ", *gram_cols))
        .filter(F.col("_last").isNotNull())
        .select("doc_id", "pos", "gram")
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") > 1)
        .select("gram")
    )
    starts = grams.join(dup, "gram").select("doc_id", "pos")
    cov = starts.select(
        "doc_id",
        F.explode(F.expr(f"sequence(pos, pos + {k - 1})")).alias("pos"),
    ).distinct()
    wi = Window.partitionBy("doc_id").orderBy("pos")
    cstats = (
        cov.withColumn("island", F.col("pos") - F.row_number().over(wi))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_tokens"),
            F.countDistinct("island").alias("n_spans"),
        )
    )
    clean = (
        tok.join(cov, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, tok))),"
                    " s -> s.tok)"
                ),
            ).alias("clean_text")
        )
    )
    base = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return (
        base.join(cstats, "doc_id", "left")
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.coalesce("n_dup_tokens", F.lit(0))
            .cast("int")
            .alias("n_dup_tokens"),
            F.expr(
                "CAST((1000 * coalesce(n_dup_tokens, 0)) DIV n_tokens"
                " AS INT)"
            ).alias("dup_permille"),
            F.coalesce("n_spans", F.lit(0)).cast("int").alias("n_spans"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


WINNOW_K = 5  # tokens per gram
WINNOW_W = 4  # consecutive gram hashes per winnowing window
_WPOS_BITS = 21  # gram position < 2^21 (≈2M tokens/doc) fits the pack


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    2003, the MOSS algorithm) at token k-gram granularity: hash every
    k-token gram, slide a window of w consecutive hashes, and in each
    window select the minimum hash (rightmost on ties).  Any shared
    substring of ≥ w+k-1 tokens between two documents is guaranteed
    to share at least one selected fingerprint — the local-
    fingerprinting complement to MinHash (whole-doc resemblance) and
    duplicate_spans (exact corpus-wide gram census).

    Output: one row per distinct selected fingerprint
    (doc_id, fp_pos, fp_hash) with fp_pos the 0-based gram position.

    Engine-portable selection: the 40-bit md5 gram hash and the
    position pack into ONE bigint — ``h*2^22 + (2^21-1-pos)`` — so
    "min hash, rightmost on ties" is a plain integer ``min`` over a
    leading row frame; both Spark and the SQL oracle compute the
    identical packed value and decode it afterwards.  Docs with fewer
    than w grams yield their single all-gram window (pos 0).

    Shape at 10^12 docs: ONE hash shuffle on doc_id feeds the gram
    window, the winnow frame, and the per-doc gram count — Spark
    reuses the single Exchange for all three window specs; the
    distinct re-keys on (doc_id, fp_pos, fp_hash) whose prefix is the
    same key, and everything upstream of it is narrow."""
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    ws = Window.partitionBy("doc_id").orderBy("pos")
    gram_cols = [F.col("tok")] + [
        F.lead("tok", j).over(ws) for j in range(1, k)
    ]
    pos_ceil = 1 << _WPOS_BITS
    grams = (
        # the gram must be materialized BEFORE the tail filter: window
        # leads evaluated after it would see the filtered relation and
        # truncate the last k-1 grams
        tok.withColumn("_last", F.lead("tok", k - 1).over(ws))
        .withColumn("gram", F.concat_ws(" ", *gram_cols))
        .filter(F.col("_last").isNotNull())
        .select(
            "doc_id",
            "pos",
            (
                (_h13(F.col("gram")) % (1 << 40)) * (pos_ceil * 2)
                + (F.lit(pos_ceil - 1) - F.col("pos"))
            ).alias("packed"),
        )
    )
    wf = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    wd = Window.partitionBy("doc_id")
    sel = (
        grams.withColumn("wmin", F.min("packed").over(wf))
        .withColumn("n_h", F.count("*").over(wd))
        .filter(
            (F.col("pos") <= F.col("n_h") - w)
            | ((F.col("n_h") < w) & (F.col("pos") == 0))
        )
        .select(
            "doc_id",
            F.expr(f"CAST(wmin DIV {pos_ceil * 2} AS BIGINT)").alias(
                "fp_hash"
            ),
            F.expr(f"CAST({pos_ceil - 1} - wmin % {pos_ceil * 2} AS INT)")
            .alias("fp_pos"),
        )
        .distinct()
    )
    return sel.select("doc_id", "fp_pos", "fp_hash")


def incremental_dedup(incoming: DataFrame, base: DataFrame) -> DataFrame:
    """Snapshot-increment dedup: classify each INCOMING doc against an
    existing BASE corpus — the daily-ingest shape of a 100 TB
    pipeline, where the base fingerprint index (text digest + LSH band
    keys) is a materialized table and only the (much smaller)
    increment streams through.  Base docs are never compared to each
    other.

    status per incoming doc: 'exact' (byte-identical text exists in
    base; base_doc_id = min matching base id), else 'near' (shares at
    least one minhash band bucket with any base doc), else 'new'.
    n_band_hits counts colliding (band, bucket) keys either way.

    Scale shape: two hash joins keyed on digest / (band, bval).  The
    base side is one row per distinct digest and one per doc-band —
    at 10^12 base docs that index lives as a table bucketed on the
    join key, so the probe shuffles only the increment; when the
    increment is broadcast-sized AQE turns both joins into broadcasts
    with the base streaming map-side.
    """
    inc_digest = incoming.select(
        "doc_id", F.md5(F.col("text")).alias("digest")
    )
    base_index = (
        base.select(F.md5(F.col("text")).alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.min("doc_id").alias("base_doc_id"))
    )
    exact = inc_digest.join(base_index, "digest", "left")
    base_bands = _band_buckets(base).select("band", "bval").distinct()
    near = (
        _band_buckets(incoming)
        .join(base_bands, ["band", "bval"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_band_hits"))
    )
    return exact.join(near, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("base_doc_id").isNotNull(), F.lit("exact"))
        .when(F.col("n_band_hits").isNotNull(), F.lit("near"))
        .otherwise(F.lit("new"))
        .alias("status"),
        F.col("base_doc_id").cast("long").alias("base_doc_id"),
        F.coalesce("n_band_hits", F.lit(0)).cast("int").alias("n_band_hits"),
    )


def duplicate_clusters(
    pairs: DataFrame, max_rounds: int = 16
) -> DataFrame:
    """Connected components over duplicate pairs → cluster labels.

    The step production dedup needs AFTER pair generation: pairs from
    any detector (LSH-verified, embedding, simhash buckets) are only
    edges; keeping "one copy per duplicate group" requires the
    transitive closure.  Output: (doc_id, cluster_id) for every doc
    appearing in a pair, cluster_id = min doc_id of the component —
    so survivor selection is `doc_id == cluster_id`.

    Algorithm: min-label propagation with pointer jumping.  Each round
    (1) every node takes the min label over itself and its neighbors
    (one join shuffling on node id + a partial-agg groupBy), then
    (2) labels hop to their label's label (one self-join), which
    halves remaining chain lengths — O(log d) rounds for component
    diameter d, the large-star/small-star contraction bound, vs O(d)
    for plain propagation.  Labels only ever decrease, so convergence
    is a scalar sum comparison; that one number is the only thing
    that ever reaches the driver.  At 10^12 docs each round is two
    shuffles keyed on doc ids (uniform, AQE-splittable) over a frame
    no larger than the pair list — and near-dup pair lists are sparse
    by construction (LSH emits same-bucket pairs only).
    """
    edges = pairs.select(
        F.col("doc_a").cast("long").alias("a"),
        F.col("doc_b").cast("long").alias("b"),
    )
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .persist()
    )
    prev_sum = None
    for _ in range(max_rounds):
        nbr = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("lbl").alias("nlbl")
                ),
                "b",
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("nlbl").alias("nbr_min"))
        )
        step = labels.join(nbr, "node", "left").select(
            "node",
            F.least(
                F.col("lbl"), F.coalesce("nbr_min", F.col("lbl"))
            ).alias("lbl"),
        )
        hop = step.select(
            F.col("node").alias("lnode"), F.col("lbl").alias("llbl")
        )
        step = (
            step.join(hop, step["lbl"] == hop["lnode"], "left")
            .select("node", F.coalesce("llbl", "lbl").alias("lbl"))
            .persist()
        )
        cur_sum = step.agg(F.sum("lbl")).collect()[0][0]
        labels.unpersist()
        labels = step
        if prev_sum is not None and cur_sum == prev_sum:
            return labels.select(
                F.col("node").alias("doc_id"),
                F.col("lbl").alias("cluster_id"),
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"duplicate_clusters did not converge in {max_rounds} rounds"
    )


CONTAM_W = 5  # benchmark-overlap n-gram width


def contamination_check(
    docs: DataFrame, benchmark: DataFrame, w: int = CONTAM_W
) -> DataFrame:
    """Benchmark decontamination — flag training documents sharing any
    word w-gram with a held-out benchmark set (the standard
    n-gram-overlap contamination test run before pretraining).

    The benchmark side collapses to its DISTINCT w-grams; that set is
    small relative to the corpus (benchmarks are thousands of items,
    the corpus is 10^12 docs), so the overlap join BROADCASTS the
    benchmark grams and the corpus side streams through map-side —
    zero shuffle of corpus data.  If a benchmark outgrows the
    broadcast threshold the same join degrades gracefully to a
    shuffled hash join keyed on the gram.

    Output: one row per CONTAMINATED doc — overlapping-gram count +
    one deterministic example gram (min) for audit.
    """
    bench_grams = _shingles(
        benchmark.select("doc_id", "text"), w
    ).select(F.col("shingle").alias("bgram")).distinct()
    doc_grams = _shingles(docs, w)
    return (
        doc_grams.join(
            F.broadcast(bench_grams),
            doc_grams["shingle"] == bench_grams["bgram"],
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_overlaps"),
            F.min("shingle").alias("example_gram"),
        )
    )


def prefix_filter_pairs(
    docs: DataFrame, tau_num: int = 4, tau_den: int = 5
) -> DataFrame:
    """EXACT Jaccard >= tau similarity join via PREFIX FILTERING
    (Chaudhuri/Ganti/Kaushik 2006; Xiao et al. ppjoin) — the missing
    quadrant of the dedup family: minhash-LSH is approximate,
    ngram_jaccard_pairs' any-shingle join is the quadratic audit
    baseline; this one is exact AND scale-safe.

    Pigeonhole completeness: jaccard(A,B) >= tau implies
    |A∩B| >= ceil(tau*|A|), so A must share a shingle with B among
    its first L_A = |A| - ceil(tau*|A|) + 1 shingles under ANY fixed
    global order (lexicographic here) — candidates generated by
    joining each doc's PREFIX shingles against the full posting list
    can never miss a qualifying pair (the oracle proves it: its
    candidates are the independent any-shared-shingle join).  At
    tau = 0.8 the prefix is ~20% of each doc's shingles, and only
    prefix x posting pairs materialize — the candidate volume LSH
    pays nothing to beat, with a guarantee LSH cannot give.

    Verify stage reuses lsh_verified_pairs' doc-keyed shape: the
    candidate pair list joins each side's shingle set on doc_id —
    shuffles key on doc ids, never on shingle values, so hot shingles
    cannot form a quadratic join.  Threshold math is integer
    cross-multiplication (shared * tau_den >= tau_num * union);
    output jaccard in truncated permille.

    Same-lang candidates only (the ngram_jaccard_pairs convention).
    Output: (doc_a, doc_b, shared, uni, jaccard_permille)."""
    sh = _shingles(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # ceil(tau * n) = (tau_num*n + tau_den - 1) DIV tau_den
    pfx = (
        sh.groupBy("doc_id", "lang")
        .agg(
            F.array_sort(F.collect_list("shingle")).alias("arr"),
            F.count("*").alias("n"),
        )
        .withColumn(
            "_L",
            F.expr(
                f"n - (({tau_num} * n + {tau_den - 1}) DIV {tau_den}) + 1"
            ).cast("int"),
        )
        .select(
            "doc_id",
            "lang",
            F.explode(F.expr("slice(arr, 1, _L)")).alias("shingle"),
        )
    )
    cand = (
        pfx.alias("p")
        .join(
            sh.alias("q"),
            (F.col("p.shingle") == F.col("q.shingle"))
            & (F.col("p.lang") == F.col("q.lang"))
            & (F.col("p.doc_id") != F.col("q.doc_id")),
        )
        .select(
            F.least("p.doc_id", "q.doc_id").alias("doc_a"),
            F.greatest("p.doc_id", "q.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sz.alias("sa")
    sb = sz.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "uni",
            F.col("sa.n") + F.col("sb.n") - F.col("shared"),
        )
        .filter(
            F.col("shared") * tau_den >= tau_num * F.col("uni")
        )
        .select(
            F.col("doc_a").cast("bigint").alias("doc_a"),
            F.col("doc_b").cast("bigint").alias("doc_b"),
            F.col("shared").cast("bigint").alias("shared"),
            F.col("uni").cast("bigint").alias("uni"),
            F.expr("(1000 * shared) DIV uni")
            .cast("bigint")
            .alias("jaccard_permille"),
        )
    )

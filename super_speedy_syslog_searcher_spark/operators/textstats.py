"""Text analysis over `documents`: token counting, quality scoring,
language-ID heuristic, fingerprinting.

All built-in expressions (regexp_extract_all / split / aggregate) —
WholeStageCodegen throughout, trivially data-parallel at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
STOPWORDS = [
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
]


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letters / digits /
    single punctuation) per document."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ws_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)")
        ).cast("bigint").alias("re_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features and a
    combined score — the standard pretraining-corpus quality gate."""
    words = F.split(F.lower(F.col("text")), " ")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(words, stop_arr))
    punct = F.size(F.expr("regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)"))
    mean_word_len = (
        F.length(F.regexp_replace(F.col("text"), " ", "")) / n_words
    )
    return docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(n_stop / n_words, 4).alias("stop_ratio"),
        F.round(punct / F.length("text"), 4).alias("punct_ratio"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        # floor(x*1e4 + .5) -> integer: engine round() rules (HALF_UP
        # vs bankers) disagree exactly at .5 boundaries; floor doesn't
        F.floor(
            (
                (n_stop / n_words) * 2.0
                - (punct / F.length("text"))
                + F.least(F.length("text") / F.lit(500.0), F.lit(1.0))
            )
            * 10000
            + 0.5
        ).cast("bigint").alias("quality_x10k"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """n-gram/stopword language heuristic: English stopword density
    over whitespace tokens; declares 'en' above 2%, else 'other'.
    (The synthetic corpus is English-ish regardless of its lang
    column — the heuristic is the deliverable, the lang column the
    join check.)"""
    words = F.split(F.lower(F.col("text")), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    density = F.size(F.array_intersect(words, stop_arr)) / F.size(words)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        F.round(density, 4).alias("en_density"),
        F.when(density > 0.02, "en").otherwise("other").alias("lang_guess"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase
    text (content hash) + md5 of the sorted distinct word set
    (bag-of-words hash, order-insensitive near-dup key)."""
    norm = F.regexp_replace(F.lower(F.col("text")), " +", " ")
    bow = F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " ")))
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_fp"),
        F.md5(bow).alias("bow_fp"),
    )


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Gopher/MassiveText-style repetition quality features: the
    fraction of tokens that are the single most frequent token, and
    the fraction of word-bigram occurrences that are repeats (1 −
    distinct/total).  Degenerate, loop-generated, or boilerplate text
    scores high on both; the standard pretraining filter drops it.

    Fractions are INTEGER PERMILLE via floor division — engine round()
    rules disagree exactly at .5 ties (quality_scores' floor+0.5 note),
    and small-denominator token ratios DO land on ties, so no floats
    leave this operator.

    Scale: explode + two partial-agg groupBys keyed on doc_id (+token)
    — map-side combine absorbs the token fan-out; no joins other than
    the final doc_id-keyed merge of the two aggregate frames.
    """
    words = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("_w")
    )
    toks = words.select("doc_id", F.explode("_w").alias("tok"))
    tok_stats = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("max_tok"),
            F.sum("c").alias("n_tokens"),
        )
    )
    bigrams = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(_w) >= 2 THEN "
                "transform(sequence(1, size(_w) - 1), "
                "i -> concat_ws(' ', slice(_w, i, 2))) "
                "ELSE array() END"
            )
        ).alias("bg"),
    )
    bg_stats = bigrams.groupBy("doc_id").agg(
        F.count("*").alias("n_bg"),
        F.countDistinct("bg").alias("n_bg_d"),
    )
    out = tok_stats.join(bg_stats, "doc_id", "left")
    top_pm = F.expr("(1000 * max_tok) DIV n_tokens")
    dup_pm = F.coalesce(
        F.expr("(1000 * (n_bg - n_bg_d)) DIV n_bg"), F.lit(0)
    )
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        top_pm.cast("bigint").alias("top_tok_permille"),
        dup_pm.cast("bigint").alias("dup_bigram_permille"),
        ((top_pm >= 200) | (dup_pm >= 300)).alias("is_repetitive"),
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Unigram language-model scoring — the CCNet-style perplexity
    quality gate, self-trained: token frequencies over the corpus
    itself form the LM, and each document scores the sum of its
    tokens' negative log-probabilities.  Outlier-high per-token NLL =
    rare-token noise; outlier-low = degenerate repetition.

    Numeric determinism: each DISTINCT token's NLL is floored to
    integer micro-nats FIRST (floor(-1e6·ln(c/T))), then summed as
    bigints — so the per-doc sum is exact integer math, independent
    of summation order (a raw double sum would differ between
    engines by ulps).  The only cross-engine float exposure is
    ln() itself on identical doubles, guarded by the 1e-6-wide
    integer floor.

    Scale: the vocab frequency table is tiny relative to the corpus
    (it IS the distinct-token set) → broadcast join onto the token
    stream; one partial-agg groupBy(doc_id) finishes.  At web vocab
    sizes past the broadcast threshold the same join degrades to a
    shuffled hash join keyed on the token."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("T"))
    vocab = freq.crossJoin(F.broadcast(total)).select(
        "tok",
        F.floor(
            F.lit(-1_000_000.0) * F.log(F.col("c") / F.col("T"))
        ).cast("bigint").alias("nll_micro"),
    )
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("nll_micro").cast("bigint").alias("nll_micro_sum"),
        )
        .withColumn(
            "nll_per_tok_micro",
            F.expr("nll_micro_sum DIV n_tokens").cast("bigint"),
        )
    )


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Bigram language-model scoring, self-trained on the corpus —
    the next-order sibling of :func:`unigram_logprob`.  Conditional
    MLE: P(w2|w1) = c(w1,w2) / c_left(w1), where c_left counts w1 as
    a bigram LEFT element (so the denominator marginalizes exactly
    over the numerator and the distribution sums to 1 per w1 —
    no last-token edge mismatch).  Every bigram a doc scores occurs
    in the corpus by construction, so no backoff is needed.

    Numeric determinism (the unigram_logprob recipe): each DISTINCT
    bigram's NLL floors to integer micro-nats first
    (floor(-1e6·ln(c2/c1))), then per-doc sums are exact bigint math;
    the only float exposure is ln() on identical doubles, guarded by
    the 1e-6-wide integer floor.

    Scale: bigrams come from one window lead over (doc_id, pos) —
    one shuffle on doc_id; the bigram frequency table is the distinct
    bigram set (vocab²-bounded, corpus-sparse) joined back broadcast
    or, past the threshold, hash-keyed on the bigram."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.withColumn("w2", F.lead("tok").over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.col("tok").alias("w1"), "w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    lm = c2.join(c1, "w1").select(
        "w1",
        "w2",
        F.floor(F.lit(-1_000_000.0) * F.log(F.col("c2") / F.col("c1")))
        .cast("bigint")
        .alias("nll_micro"),
    )
    return (
        bg.join(F.broadcast(lm), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("nll_micro").cast("bigint").alias("nll_micro_sum"),
        )
        .withColumn(
            "nll_per_bigram_micro",
            F.expr("nll_micro_sum DIV n_bigrams").cast("bigint"),
        )
    )


def vocab_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus vocabulary head: the k most frequent tokens with rank
    and cumulative coverage (integer permille) — the profiling step
    before tokenizer/BPE training and the input to stopword and
    heavy-hitter decisions.

    Scale: token counts are one partial-agg groupBy; the top-k is
    orderBy().limit(k) which Spark executes as TakeOrderedAndProject
    (per-partition heaps + a k-row driver-side merge, never a global
    sort — the kmv_distinct shape).  The cumulative window runs over
    k rows only.  Ties break on the token string so ranks are total.
    """
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("T"))
    top = (
        freq.orderBy(F.desc("c"), "tok")
        .limit(k)
        .crossJoin(F.broadcast(total))
    )
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("c"), "tok"))
        .cast("int")
        .alias("rank"),
        "tok",
        F.col("c").cast("bigint").alias("count"),
        F.expr("(1000 * sum(c) OVER (ORDER BY c DESC, tok "
               "ROWS UNBOUNDED PRECEDING)) DIV T")
        .cast("bigint")
        .alias("cum_permille"),
    )


# PII redaction patterns — shared verbatim with the DuckDB oracle, so
# every construct must behave identically in Java regex and RE2
# (no backreferences, no lookaround)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONGNUM_RE = r"\d{8,}"


URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def domain_profile(
    docs: DataFrame, blocklist: DataFrame | None = None
) -> DataFrame:
    """Per-domain URL profile of the corpus — the input to
    domain-level mixing/blocking decisions in a web-scale pipeline
    (how much of the corpus cites each domain, and is it blocked).

    Extracts every http(s) URL's host with one regexp_extract_all
    (RE2-safe pattern shared with the DuckDB oracle), explodes to one
    row per citation, and aggregates (n_urls, n_docs) per domain;
    `blocklist` (a small one-column `domain` frame) marks blocked
    domains via broadcast left join — zero corpus-side shuffle beyond
    the domain-keyed count.

    Scale: the explode is bounded by citations per doc; the groupBy
    keys on the domain (map-side combine; hot domains are exactly the
    point of the report).  The blocklist is dimension-sized →
    broadcast."""
    cites = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(URL_DOMAIN_RE), 1)
        ).alias("domain"),
    )
    prof = cites.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    if blocklist is None:
        return prof.withColumn("blocked", F.lit(False))
    bl = blocklist.select(
        F.col("domain").alias("_bdom"), F.lit(True).alias("_blk")
    ).distinct()
    return (
        prof.join(
            F.broadcast(bl), prof["domain"] == bl["_bdom"], "left"
        )
        .select(
            "domain",
            "n_urls",
            "n_docs",
            F.coalesce("_blk", F.lit(False)).alias("blocked"),
        )
    )


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k terms per document by tf-idf — the classic keyword /
    topic-signal extraction over a corpus.  idf is the LINEAR form
    N/df (not log N/df): tf·N/df involves only IEEE-exact multiply
    and divide, so two engines produce bit-identical scores and the
    hashed score column is portable; the ranking it induces equals
    the log form's whenever tf is constant and is the standard
    "raw idf" variant otherwise (documented deviation).

    Scale shape: tf = groupBy(doc_id, tok) with map-side combine;
    df = groupBy(tok) over the (doc, tok) table (distinct by
    construction); the join back is keyed on tok (shuffle join — the
    vocabulary is NOT assumed broadcastable at 10^12 docs); top-k is
    a row_number window over doc_id, never a global sort."""
    n = docs.count()
    words = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, ' '), w -> w <> '')")
        ).alias("tok"),
    )
    tf = words.groupBy("doc_id", "tok").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    score = F.col("tf") * F.lit(float(n)) / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        tf.join(dfreq, "tok")
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            "tok",
            "tf",
            "df",
            F.floor(F.col("score") * 10000 + 0.5)
            .cast("bigint")
            .alias("score_x1e4"),
        )
    )


def dsir_weights(
    docs: DataFrame, target_lang: str = "en", scale: int = 1_000_000
) -> DataFrame:
    """Data-selection importance weights (DSIR, Xie et al. 2023):
    score every document by how target-like its unigram distribution
    is, target = the ``lang == target_lang`` slice, raw = the whole
    corpus, both add-1 smoothed over the shared vocabulary.

    Deviation for engine portability: the per-token statistic is the
    LINEAR probability ratio p_t(w)/p_r(w) (not its log) quantized to
    an integer (``floor(ratio*1e6 + 0.5)``), and the per-doc weight is
    the count-weighted INTEGER sum of those ratios.  Log-ratio sums
    are doubles whose distributed summation order is nondeterministic;
    the integer form is bit-stable across runs and engines.  (The
    ratio itself uses only bigint products < 2^53 and one double
    divide — IEEE-exact everywhere.  Switching to log weights is
    ``F.log`` on one line if bit-stability is not required.)

    Scale shape: two token-keyed aggregations (map-side combined), a
    3-scalar totals reduce, one tok-keyed shuffle join (vocabulary NOT
    assumed broadcastable at 10^12 docs), one doc-keyed sum."""
    toks = docs.select(
        "doc_id",
        (F.col("lang") == target_lang).cast("int").alias("is_t"),
        F.explode(
            F.expr("filter(split(text, ' '), w -> w <> '')")
        ).alias("tok"),
    )
    doc_tok = toks.groupBy("doc_id", "tok").agg(
        F.count("*").cast("bigint").alias("c")
    )
    vocab = toks.groupBy("tok").agg(
        F.sum("is_t").cast("bigint").alias("ct"),
        F.count("*").cast("bigint").alias("cr"),
    )
    tt, tr, vn = vocab.agg(
        F.sum("ct"), F.sum("cr"), F.count("*")
    ).collect()[0]
    ratio = ((F.col("ct") + 1) * F.lit(int(tr) + int(vn))).cast(
        "double"
    ) / ((F.col("cr") + 1) * F.lit(int(tt) + int(vn)))
    rates = vocab.select(
        "tok",
        F.floor(ratio * scale + F.lit(0.5)).cast("bigint").alias("sr"),
    )
    return (
        doc_tok.join(rates, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_toks"),
            F.sum(F.col("c") * F.col("sr"))
            .cast("bigint")
            .alias("weight_x1e6"),
        )
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    docs: DataFrame, min_words: int = 50, max_words: int = 100_000
) -> DataFrame:
    """Gopher corpus-quality rules (Rae et al. 2021 §A1.1) as per-doc
    flags plus the combined keep decision — the canonical rule-based
    pretraining filter:

      word_count     min_words <= n <= max_words
      mean_word_len  3 <= mean chars/word <= 10
      symbol_ratio   (#'#' + #'...') / words < 0.1
      bullet_lines   < 90% of lines start with a bullet
      ellipsis_lines < 30% of lines end with '...'
      alpha_words    >= 80% of words contain an alphabetic char
      stop_words     >= 2 distinct words from Gopher's 8-word stop set

    Every ratio threshold is evaluated by integer cross-multiplication
    (e.g. ``10*symbols < n_words``) — zero floats, so two engines
    agree bit-for-bit and the keep column is hash-stable.  Pure
    built-in expressions: WholeStageCodegen, row-parallel at 10^12
    docs, no shuffle at all."""
    words = F.expr("filter(split(text, ' '), w -> w <> '')")
    n_words = F.size(words)
    word_chars = F.expr(
        "aggregate(filter(split(text, ' '), w -> w <> ''),"
        " 0L, (a, w) -> a + char_length(w))"
    )
    n_hash = F.length("text") - F.length(F.replace("text", F.lit("#")))
    n_ellipsis = (
        F.length("text") - F.length(F.replace("text", F.lit("...")))
    ) / 3
    n_symbols = (n_hash + n_ellipsis).cast("bigint")
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.expr(
            r"""filter(split(text, '\n'),
                l -> substring(l, 1, 1) IN ('-', '*', '•'))"""
        )
    )
    n_ell_end = F.size(
        F.expr(r"filter(split(text, '\n'), l -> l LIKE '%...')")
    )
    n_alpha = F.size(
        F.expr(
            "filter(filter(split(text, ' '), w -> w <> ''),"
            " w -> w rlike '[A-Za-z]')"
        )
    )
    n_stop = sum(
        F.array_contains(words, s).cast("int") for s in GOPHER_STOPWORDS
    )
    f_wc = (n_words >= min_words) & (n_words <= max_words)
    f_mwl = (word_chars >= 3 * n_words) & (word_chars <= 10 * n_words)
    f_sym = 10 * n_symbols < n_words
    f_bul = 10 * n_bullet < 9 * n_lines
    f_ell = 10 * n_ell_end < 3 * n_lines
    f_alpha = 10 * n_alpha >= 8 * n_words
    f_stop = n_stop >= 2
    keep = f_wc & f_mwl & f_sym & f_bul & f_ell & f_alpha & f_stop
    return docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        f_wc.cast("int").alias("flag_word_count"),
        f_mwl.cast("int").alias("flag_mean_word_len"),
        f_sym.cast("int").alias("flag_symbol_ratio"),
        f_bul.cast("int").alias("flag_bullet_lines"),
        f_ell.cast("int").alias("flag_ellipsis_lines"),
        f_alpha.cast("int").alias("flag_alpha_words"),
        f_stop.cast("int").alias("flag_stop_words"),
        keep.cast("int").alias("keep"),
    )


def redact_pii(docs: DataFrame) -> DataFrame:
    """PII scrubbing — the standard pretraining-corpus redaction gate:
    emails → <EMAIL>, IPv4 literals → <IP>, 8+-digit runs
    (phone/account/card shapes) → <NUM>, applied in that order so an
    IP inside an already-redacted email can't double-fire.  Pure
    regexp_replace chain: WholeStageCodegen, row-parallel at 10^12
    docs.  Per-doc match counts are taken BEFORE redaction (audit
    metric: how much PII the corpus carried)."""
    # python-API regexp functions take the pattern verbatim — no SQL
    # string-literal escape pass mangling the \d / \b classes
    n_email = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(PII_EMAIL_RE), F.lit(0))
    )
    n_ip = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(PII_IPV4_RE), F.lit(0))
    )
    clean1 = F.regexp_replace(F.col("text"), PII_EMAIL_RE, "<EMAIL>")
    clean2 = F.regexp_replace(clean1, PII_IPV4_RE, "<IP>")
    # count long digit runs on the IP-redacted text (an IPv4 is not
    # ALSO a long number)
    n_num = F.size(
        F.regexp_extract_all(clean2, F.lit(PII_LONGNUM_RE), F.lit(0))
    )
    clean3 = F.regexp_replace(clean2, PII_LONGNUM_RE, "<NUM>")
    return docs.select(
        "doc_id",
        clean3.alias("clean_text"),
        n_email.cast("int").alias("n_emails"),
        n_ip.cast("int").alias("n_ips"),
        n_num.cast("int").alias("n_longnums"),
    )


PACK_SEQ_LEN = 2048


def pack_sequences(docs: DataFrame, seq_len: int = PACK_SEQ_LEN) -> DataFrame:
    """Concatenate-and-chunk sequence packing — the GPT-pretraining
    shape: documents are concatenated in doc_id order and cut into
    fixed seq_len-token examples, so a document may span a pack
    boundary.  Token position = exclusive running sum of per-doc
    whitespace token counts (one window over a constant partition is
    fine at test scale; at 10^12 docs the running sum comes from
    per-Iceberg-partition token subtotals — a two-level scan — and the
    window becomes per-partition).  Each doc explodes to the packs it
    overlaps (bounded: ≤ tokens/seq_len + 1 rows), then pack-level
    aggregation shuffles on pack_id only.

    Output: one row per pack — n_docs spanning it, n_tokens (seq_len
    except the final pack), first/last doc id.
    """
    toks = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    d = docs.select("doc_id", toks.alias("toks")).withColumn(
        "start_tok", F.coalesce(F.sum("toks").over(w), F.lit(0))
    )
    packs = d.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                (F.col("start_tok") / seq_len).cast("bigint"),
                (
                    (F.col("start_tok") + F.col("toks") - 1) / seq_len
                ).cast("bigint"),
            )
        ).alias("pack_id"),
        "start_tok",
    )
    end_tok = F.col("start_tok") + F.col("toks")
    tok_in_pack = (
        F.least(end_tok, (F.col("pack_id") + 1) * seq_len)
        - F.greatest(F.col("start_tok"), F.col("pack_id") * seq_len)
    )
    return (
        packs.withColumn("tok_in_pack", tok_in_pack)
        .groupBy("pack_id")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum("tok_in_pack").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


PACK_N_BUCKETS = 64


def pack_sequences_bucketed(
    docs: DataFrame,
    seq_len: int = PACK_SEQ_LEN,
    n_buckets: int = PACK_N_BUCKETS,
) -> DataFrame:
    """The 10^12-doc form of ``pack_sequences`` — OUTPUT-IDENTICAL to
    the global-window version (tested), with the running token sum
    computed as a two-level scan instead of one global window:

     1. docs bucket by contiguous doc_id range (the Iceberg partition
        analogue; any range-partitioning that preserves doc order
        works);
     2. per-bucket token subtotals — a tiny n_buckets-row aggregate —
        turn into per-bucket base offsets via one window over that
        METADATA-sized frame, broadcast back;
     3. each doc's global start offset = bucket base + a window that
        partitions BY BUCKET (no global single-partition sort
        anywhere; plan-asserted).

    The explode/aggregate tail is shared with the global version.
    """
    toks = F.size(F.split(F.col("text"), " ")).cast("bigint")
    d = docs.select("doc_id", toks.alias("toks"))
    # contiguous RANGE buckets from the doc_id value itself — all the
    # ordering needs is bucket order agreeing with doc_id order, which
    # integer division preserves.  The max-id lookup is one
    # metadata-sized agg (at 10^12 rows it comes from the table's
    # partition statistics, not a scan).
    hi = d.agg(F.max("doc_id").alias("hi")).collect()[0]["hi"] or 0
    span = max(1, (int(hi) + n_buckets) // n_buckets)
    d = d.withColumn(
        "_bkt", (F.col("doc_id") / F.lit(span)).cast("bigint")
    )
    base = (
        d.groupBy("_bkt")
        .agg(F.sum("toks").alias("_sub"))
        .withColumn(
            "_base",
            F.coalesce(
                F.sum("_sub").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bkt", "_base")
    )
    w_in = Window.partitionBy("_bkt").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    d = (
        d.join(F.broadcast(base), "_bkt")
        .withColumn(
            "start_tok",
            F.col("_base")
            + F.coalesce(F.sum("toks").over(w_in), F.lit(0)),
        )
        .drop("_bkt", "_base")
    )
    packs = d.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                (F.col("start_tok") / seq_len).cast("bigint"),
                (
                    (F.col("start_tok") + F.col("toks") - 1) / seq_len
                ).cast("bigint"),
            )
        ).alias("pack_id"),
        "start_tok",
    )
    end_tok = F.col("start_tok") + F.col("toks")
    tok_in_pack = (
        F.least(end_tok, (F.col("pack_id") + 1) * seq_len)
        - F.greatest(F.col("start_tok"), F.col("pack_id") * seq_len)
    )
    return (
        packs.withColumn("tok_in_pack", tok_in_pack)
        .groupBy("pack_id")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum("tok_in_pack").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def inverted_index(docs: DataFrame, df_cap: int = 64) -> DataFrame:
    """Inverted index over the corpus: one row per token with its
    document frequency and a rendered posting list
    "doc:pos,doc:pos,..." in (doc_id, pos) order — the lookup
    structure contamination / attribution / search tooling builds
    over training corpora.

    Tokens whose document frequency exceeds df_cap keep df but elide
    postings (NULL) — the stopword rule every real index applies,
    and the skew guard here: posting lists are the classic hot key,
    and the cap bounds the per-token collect_list at df_cap
    documents' worth of positions.

    Scale shape: one posexplode + one token-keyed groupBy (the
    unavoidable index shuffle); the count and the capped list share
    it.  Rendering is in-row (sort_array + transform + array_join),
    no second pass."""
    tok = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.posexplode(F.split(F.lower("text"), " ")).alias(
            "pos", "token"
        ),
    ).filter(F.col("token") != "")
    return (
        tok.groupBy("token")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("df"),
            F.sort_array(
                F.collect_list(F.struct("doc_id", "pos"))
            ).alias("_p"),
        )
        .select(
            "token",
            "df",
            F.when(
                F.col("df") <= df_cap,
                F.array_join(
                    F.transform(
                        "_p",
                        lambda s: F.concat_ws(
                            ":",
                            s["doc_id"].cast("string"),
                            s["pos"].cast("string"),
                        ),
                    ),
                    ",",
                ),
            ).alias("postings"),
        )
    )

"""Text analysis over `documents`: token counting, quality scoring,
language-ID heuristic, fingerprinting.

All built-in expressions (regexp_extract_all / split / aggregate) —
WholeStageCodegen throughout, trivially data-parallel at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

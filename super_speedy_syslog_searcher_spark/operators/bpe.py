"""Byte-pair-encoding tokenizer training over the corpus — the
tokenizer-prep stage of a pretraining pipeline (Sennrich et al. 2016),
built the way production tokenizer trainers actually run at scale:

  1. ONE corpus-wide pass builds the word-frequency table (a
     map-side-combined groupBy — the only step that touches all the
     data);
  2. merge training iterates on that table, which is vocabulary-sized
     (top_v rows, driver-scale by construction — the same shape as
     HuggingFace tokenizers' trainer, which also reduces the corpus
     to word counts before merging);
  3. encoding broadcasts the learned merge ranks back over the corpus
     via mapInPandas with a per-batch distinct-token cache, so each
     distinct token is encoded once per Arrow batch regardless of its
     frequency.

Symbols are characters within whitespace tokens (no end-of-word
marker; documented deviation from Sennrich's `</w>`).  All tie-breaks
are deterministic: the winning pair is (max count, then
lexicographically smallest), so two engines/runs produce identical
merge lists.

Reference parity: s4 has no tokenizer, but its DTPD pattern-bank
broadcast (src/data/datetime.rs DATETIME_PARSE_DATAS) is the same
shape — a small learned table shipped to every executor and applied
vectorized.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_TOP_V = 65536


def word_counts(docs: DataFrame) -> DataFrame:
    """Corpus word-frequency table: (tok, cnt).  Map-side combine;
    the single all-data pass of BPE training."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def pair_counts(docs: DataFrame) -> DataFrame:
    """Adjacent character-pair counts weighted by token frequency —
    the statistic the first BPE merge maximizes.  Output (pair, n).

    The explode runs over the DISTINCT-token table, not the corpus:
    pair extraction costs O(vocab · token_len), never O(corpus)."""
    wc = word_counts(docs)
    pairs = wc.select(
        "cnt",
        F.explode(
            F.expr(
                "CASE WHEN char_length(tok) >= 2 THEN"
                " transform(sequence(1, char_length(tok) - 1),"
                " i -> substring(tok, i, 2))"
                " ELSE array() END"
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )


def _merge_seq(sym: list[str], left: str, right: str) -> list[str]:
    """Apply one merge to a symbol sequence, left-to-right
    non-overlapping (standard BPE semantics)."""
    out: list[str] = []
    i = 0
    n = len(sym)
    while i < n:
        if i + 1 < n and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def train_bpe(
    docs: DataFrame, n_merges: int = 8, top_v: int = BPE_TOP_V
) -> DataFrame:
    """Learn `n_merges` BPE merges from the corpus.  Returns a
    DataFrame (rank, left, right, n) — rank is merge order, n the
    weighted pair count at selection time.

    The corpus-scale work is the distributed word_counts pass; the
    iteration runs on the collected top-`top_v` word table
    (deterministic cap: count desc, then token), which is
    vocabulary-sized by construction — the industry-standard trainer
    shape, not a driver-side loop over corpus rows."""
    spark = docs.sparkSession
    top = (
        word_counts(docs)
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(top_v)
        .collect()
    )
    seqs: list[tuple[list[str], int]] = [
        (list(r["tok"]), int(r["cnt"])) for r in top
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: Counter[tuple[str, str]] = Counter()
        for sym, cnt in seqs:
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] += cnt
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, int(n)))
        seqs = [(_merge_seq(s, left, right), c) for s, c in seqs]
    return spark.createDataFrame(
        merges, "rank int, left string, right string, n bigint"
    )


def _encode_token(tok: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one token: repeatedly merge the
    lowest-rank adjacent pair (the canonical GPT-2/tokenizers
    algorithm)."""
    sym = list(tok)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def encode_bpe(docs: DataFrame, merges: DataFrame) -> DataFrame:
    """Encode every document with a learned merge table.  Output
    (doc_id, n_tokens, n_bpe, bpe_text) where bpe_text joins symbols
    with spaces (symbol concatenation restores the original token).

    The merge table is broadcast as a plain dict (it is n_merges
    rows); encoding runs in mapInPandas with a per-batch
    distinct-token cache — each distinct token is encoded once per
    Arrow batch, so hot tokens cost O(1) amortized."""
    rank_rows = [
        ((r["left"], r["right"]), int(r["rank"]))
        for r in merges.select("rank", "left", "right").collect()
    ]
    ranks = dict(rank_rows)
    bc = docs.sparkSession.sparkContext.broadcast(ranks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out_nt, out_nb, out_txt = [], [], []
            for text in pdf["text"]:
                toks = [t for t in str(text).split(" ") if t]
                syms: list[str] = []
                for t in toks:
                    enc = cache.get(t)
                    if enc is None:
                        enc = _encode_token(t, rk)
                        cache[t] = enc
                    syms.extend(enc)
                out_nt.append(len(toks))
                out_nb.append(len(syms))
                out_txt.append(" ".join(syms))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pd.Series(out_nt, dtype="int32"),
                    "n_bpe": pd.Series(out_nb, dtype="int32"),
                    "bpe_text": out_txt,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run,
        "doc_id bigint, n_tokens int, n_bpe int, bpe_text string",
    )

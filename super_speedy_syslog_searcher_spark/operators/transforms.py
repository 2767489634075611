"""Document-level training-example transforms.

Reference parity: s4 has no training-example stage; these are
training-data ops (SURVEY.md LLM-pipeline section) over the
`documents` table, in the deterministic-hash style of
operators/sketch.py (every randomized choice is a pure function of
the row, so output is bit-identical across engines, runs, and
re-sharding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketch import _h13

FIM_PRE = "<PRE>"
FIM_SUF = "<SUF>"
FIM_MID = "<MID>"


def fim_split(
    docs: DataFrame, min_chars: int = 3, seed: str = "fim1"
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022), PSM mode:
    split each document at two hash-derived cut points into
    (prefix, middle, suffix), all three non-empty, and emit the
    training string ``<PRE>prefix<SUF>suffix<MID>middle``.  The cuts
    are a pure function of (doc_id, seed):

        cut1 = 1 + h1 % (n - 2)            in [1, n-2]
        cut2 = cut1 + 1 + h2 % (n - cut1 - 1)   in [cut1+1, n-1]

    so the same corpus always yields the same FIM examples (the
    reproducibility FIM-pretraining ablations need).  Docs shorter
    than ``min_chars`` (< 3 effective) can't host two interior cuts
    and are dropped.

    Scale: a pure narrow map — two md5 hashes and three substrings
    per row, zero shuffle at any corpus size (plan-asserted in
    tests)."""
    eff_min = max(int(min_chars), 3)
    n = F.length("text")
    h1 = _h13(F.concat(F.col("doc_id").cast("string"), F.lit("#a#" + seed)))
    h2 = _h13(F.concat(F.col("doc_id").cast("string"), F.lit("#b#" + seed)))
    t = docs.filter(n >= eff_min).select(
        "doc_id",
        "text",
        (F.lit(1) + h1 % (n - F.lit(2))).cast("int").alias("cut1"),
    )
    t = t.withColumn(
        "cut2",
        (
            F.col("cut1")
            + F.lit(1)
            + h2 % (F.length("text") - F.col("cut1") - F.lit(1))
        ).cast("int"),
    )
    prefix = F.substring(F.col("text"), F.lit(1), F.col("cut1"))
    middle = F.expr("substring(text, cut1 + 1, cut2 - cut1)")
    suffix = F.expr("substring(text, cut2 + 1, length(text) - cut2)")
    return t.select(
        "doc_id",
        "cut1",
        "cut2",
        F.concat(
            F.lit(FIM_PRE),
            prefix,
            F.lit(FIM_SUF),
            suffix,
            F.lit(FIM_MID),
            middle,
        ).alias("fim_text"),
    )

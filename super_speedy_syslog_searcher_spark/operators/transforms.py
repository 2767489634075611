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


def corpus_diff(
    old: DataFrame, new: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Snapshot diff between two corpus versions — the daily-refresh
    CDC shape: classify every doc id as added / removed / changed /
    unchanged by comparing content digests in a full outer join on
    the id.  Output (doc_id, status).

    Scale: one id-keyed shuffle join of two digest projections (each
    a narrow md5 map over its snapshot); no text ever moves, only
    32-byte digests.  On bucketed/Iceberg tables both sides arrive
    pre-partitioned and the join is Exchange-free."""
    o = old.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.md5("text").alias("_od"),
    )
    n = new.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.md5("text").alias("_nd"),
    )
    j = o.join(n, id_col, "full_outer")
    return j.select(
        id_col,
        F.when(F.col("_nd").isNull(), F.lit("removed"))
        .when(F.col("_od").isNull(), F.lit("added"))
        .when(F.col("_od") != F.col("_nd"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def json_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured payload extraction — the schema-on-read step
    every log pipeline has: pull the integer field `k` out of the
    JSON `props` column and aggregate it per event_type
    (n, with_k, sum_k, min_k, max_k).

    get_json_object runs JVM-side (Jackson) inside whole-stage
    codegen — no Python in the hot path; rows with missing/invalid k
    aggregate as NULL, counted separately."""
    # try_cast: a malformed k ('{"k": "nan"}') must aggregate as NULL,
    # not kill the job under ANSI mode (DuckDB twin uses TRY_CAST)
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return (
        events.select(F.col("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count("k").cast("bigint").alias("with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


def snapshot_apply(
    base: DataFrame,
    upserts: DataFrame,
    deletes: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """MERGE INTO — the write side of corpus_diff's CDC: apply an
    increment (upserted rows + delete tombstones) to a base snapshot
    and emit the next snapshot with per-row provenance:

        result = (base ANTI JOIN (upsert ids ∪ delete ids))  -> 'kept'
                 UNION upserts                               -> 'upserted'

    Round-trip law (test-pinned, and the driver oracle derives the
    target snapshot directly): applying the increment that
    corpus_diff classifies reproduces the new snapshot exactly.

    Scale: two id-keyed anti joins of id projections (text never
    moves on the kept side — only ids shuffle; the upsert side moves
    its own text once).  On bucketed/Iceberg tables the id joins are
    Exchange-free and this is exactly the copy-on-write MERGE shape."""
    dead = (
        upserts.select(F.col(id_col))
        .unionByName(deletes.select(F.col(id_col)))
        .distinct()
    )
    kept = base.select(
        F.col(id_col).cast("bigint").alias(id_col), "text"
    ).join(
        dead.select(F.col(id_col).cast("bigint").alias(id_col)),
        id_col,
        "left_anti",
    )
    return kept.withColumn("op", F.lit("kept")).unionByName(
        upserts.select(
            F.col(id_col).cast("bigint").alias(id_col), "text"
        ).withColumn("op", F.lit("upserted"))
    )

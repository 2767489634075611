"""Transcript-to-training-data operators: turn conversation/agent
transcripts (conv_id, turn_idx, role, text, tool, ts) into supervised
fine-tuning examples.

Both operators are pure window functions over (conv_id, turn_idx) —
one shuffle keyed on conv_id, sortWithinPartitions on turn_idx, no
self-join against the corpus, so they hold their shape unchanged at
10^12 turns (the conv_id hash-partitioning is the same layout
operators/layout.py's bucketed table already provides, making these
zero-Exchange on a bucketed read).

Reference parity: s4 has no SFT stage; these are training-data ops
(SURVEY.md LLM-pipeline section) over the transcript payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_sft_pairs(turns: DataFrame) -> DataFrame:
    """(prompt, response) extraction: every user turn pairs with the
    FIRST assistant turn that follows it in the same conversation,
    provided no other user turn intervenes (an intervening user turn
    means the assistant was answering someone else's message).

    Computed with a single descending-scan window: ``next_asst`` /
    ``next_user`` are running minima over the following rows — no
    join back to the corpus; the assistant text rides along via a
    ``lead``-style min_by on the same frame."""
    w_follow = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    asst_idx = F.min(
        F.when(F.col("role") == "assistant", F.col("turn_idx"))
    ).over(w_follow)
    user_idx = F.min(
        F.when(F.col("role") == "user", F.col("turn_idx"))
    ).over(w_follow)
    # text of the first following assistant turn: min_by over the
    # same frame keyed on the assistant-only turn_idx
    asst_text = F.expr(
        "min_by(CASE WHEN role = 'assistant' THEN text END,"
        " CASE WHEN role = 'assistant' THEN turn_idx END)"
    ).over(w_follow)
    out = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        asst_idx.alias("asst_idx"),
        user_idx.alias("next_user_idx"),
        asst_text.alias("response"),
    )
    return (
        out.filter(
            (F.col("role") == "user")
            & F.col("asst_idx").isNotNull()
            & (
                F.col("next_user_idx").isNull()
                | (F.col("asst_idx") < F.col("next_user_idx"))
            )
        )
        .select(
            "conv_id",
            F.col("turn_idx").alias("user_idx"),
            F.col("asst_idx").cast("int").alias("asst_idx"),
            F.col("text").alias("prompt"),
            "response",
        )
    )


def conv_chunks(
    turns: DataFrame, k: int = 4, stride: int = 2
) -> DataFrame:
    """Sliding context windows for long-context curriculum: at every
    `stride`-th turn of a conversation emit the concatenation of the
    last `k` turns (role-prefixed), newest last.  Output (conv_id,
    turn_idx, n_ctx, chunk_text)."""
    line = F.concat_ws(": ", F.col("role"), F.col("text"))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-(k - 1), 0)
    )
    wn = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        turns.withColumn("_line", line)
        .withColumn("_ctx", F.collect_list("_line").over(w))
        .withColumn("_rn", F.row_number().over(wn))
        .filter((F.col("_rn") - 1) % stride == 0)
        .select(
            "conv_id",
            "turn_idx",
            F.size("_ctx").cast("int").alias("n_ctx"),
            F.array_join("_ctx", "\n").alias("chunk_text"),
        )
    )

"""Transcript-shaping operators: conversation assembly and SFT pair
extraction — the formatting steps between raw transcript turns (the
input_hint table: conv_id, turn_idx, role, text, ...) and training
data.

Both are single-shuffle jobs keyed on conv_id (the natural unit — a
conversation's turns must co-locate, and conversations are small), so
they scale by conversation count; pure column expressions with exact
ANSI-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def conversation_documents(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Turns -> one document per conversation: ``role: text`` lines in
    turn order. Output: (conv_id, n_turns, doc). One groupBy shuffle on
    conv_id; group size is bounded by conversation length."""
    line = F.concat_ws(": ", F.col(role_col), F.col(text_col))
    return (
        df.select(F.col(conv_col).alias("conv_id"),
                  F.col(turn_col).alias("_t"), line.alias("_l"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("_t").alias("i"),
                                 F.col("_l").alias("l")))),
                    lambda s: s["l"],
                ), sep).alias("doc"),
        )
    )


def sft_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
    sep: str = "\n",
) -> DataFrame:
    """(prompt, completion) pairs for supervised fine-tuning: one row
    per assistant turn, prompt = every prior turn as ``role: text``
    lines (empty string for a conversation-opening assistant turn),
    completion = the assistant turn's text.

    One window shuffle on conv_id (cumulative context never leaves the
    conversation partition); output: (conv_id, turn_idx, prompt,
    completion)."""
    w = (Window.partitionBy(conv_col).orderBy(turn_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    line = F.concat_ws(": ", F.col(role_col), F.col(text_col))
    return (
        df.select(
            F.col(conv_col).alias("conv_id"),
            F.col(turn_col).cast("long").alias("turn_idx"),
            F.col(role_col).alias("_role"),
            F.col(text_col).alias("completion"),
            F.array_join(F.collect_list(line).over(w), sep).alias("prompt"),
        )
        .where(F.col("_role") == assistant_role)
        .select("conv_id", "turn_idx", "prompt", "completion")
    )

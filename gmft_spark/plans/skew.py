"""Skew handling for long conversations.

Per-turn extraction is embarrassingly parallel (no grouping), so it never
skews. Conversation-level operators (document assembly, per-conv ordering,
lineage rollups) group by ``conv_id`` — a 10^6-turn conversation must not
serialize into one task. The standard fix, used here: salt the grouping key
with ``floor(turn_idx / K)`` so one conversation spreads over ceil(turns/K)
tasks, aggregate per salted group, then do a cheap second-level combine.
AQE skew-join splitting (enabled in plans/session.py) covers the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, turns_per_salt: int = 1024) -> DataFrame:
    """Add a ``salt`` column = floor(turn_idx / K). Grouping on
    ``(conv_id, salt)`` bounds any task at K turns regardless of
    conversation length."""
    return df.withColumn(
        "salt", (F.col("turn_idx") / F.lit(turns_per_salt)).cast("int")
    )


def salted_repartition(
    df: DataFrame, num_partitions: int, turns_per_salt: int = 1024
) -> DataFrame:
    """Repartition on (conv_id, salt) — co-locates bounded turn ranges of a
    conversation without letting any single conversation own a partition."""
    return with_salt(df, turns_per_salt).repartition(
        num_partitions, "conv_id", "salt"
    )


def assemble_conversation_text(results: DataFrame, turns_per_salt: int = 1024) -> DataFrame:
    """Skew-safe per-conversation text assembly: stage 1 concatenates
    within (conv_id, salt) in turn order (bounded groups, map-side
    combine-friendly), stage 2 concatenates the per-salt chunks in salt
    order. Output: (conv_id, full_text) under stable turn ordering."""
    per_salt = (
        with_salt(results, turns_per_salt)
        .groupBy("conv_id", "salt")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("turn_idx", "table_id", "table_text")
                        )
                    ),
                    lambda s: s["table_text"],
                ),
            ).alias("chunk")
        )
    )
    return (
        per_salt.groupBy("conv_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("salt", "chunk"))),
                    lambda s: s["chunk"],
                ),
            ).alias("full_text")
        )
    )

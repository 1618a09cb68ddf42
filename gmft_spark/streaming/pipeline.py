"""Structured Streaming variant of the extraction pipeline.

The reference is batch-only (SURVEY.md §2.7); this module is the additive
streaming surface: transcripts land as files (or any streaming source),
extraction runs as the same stateless ``mapInPandas`` narrow map (the
kernel is deterministic, so exactly-once replay is safe), and late-data
metrics use watermarked event-time windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from gmft_spark.operators.extract import extract_tables

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-based streaming source of transcript rows."""
    return spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)


def stream_extract(transcripts: DataFrame) -> DataFrame:
    """Streaming extraction: identical operator to the batch path —
    stateless, so it composes with any trigger / checkpoint."""
    return extract_tables(transcripts)


def stream_turn_metrics(transcripts: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked per-window turn counts (late rows beyond the watermark
    are dropped): the streaming analog of the lineage metrics rollup."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute"), "role")
        .agg(F.count("*").alias("n_turns"))
    )


def stream_session_metrics(
    transcripts: DataFrame,
    gap: str = "2 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time SESSION windows per conversation (``F.session_window``):
    a session extends while consecutive turns arrive within ``gap`` and
    closes after event time passes gap + watermark — the native engine
    operator behind the batch sessionize query, here running genuinely
    incrementally (Spark merges overlapping per-batch windows in the
    state store; the watermark bounds state size, which is what makes
    10^12-turn streams feasible). One shuffle keyed on (conv_id,
    session_window), map-side partial merge first."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
            "first_turn",
            "last_turn",
        )
    )


def run_available_now(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain everything currently available to parquet and stop — the
    batch-equivalent trigger used for backfill and tests."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def snapshot_batch_committer(
    table_dir: str,
    rollup_table: str | None = None,
    rollup_keys: list[str] | None = None,
    rollup_sums: list[str] | None = None,
    mode: str = "append",
    key_cols: list[str] | None = None,
):
    """Per-micro-batch committer for a ``foreachBatch`` sink into the
    snapshot table, made EXACTLY-ONCE on top of foreachBatch's
    at-least-once contract: each commit stamps the streaming batch id
    into the snapshot summary, and a replayed batch (failure after the
    table commit but before the checkpoint advanced) finds its id in the
    commit log and returns without writing — the same idempotence recipe
    Iceberg's streaming writer uses (batch id in snapshot summary
    properties). The scan is over manifest JSON, metadata-scale.

    With ``rollup_table``, each batch also brings an aggregate table up
    to the fact table's head (``plans/rollup.refresh_rollup``) — a
    materialized view that stays fresh per micro-batch. The refresh runs
    UNCONDITIONALLY after the commit check, including on replayed
    batches: it carries its own watermark inside the state commit, so a
    replay either finds no new delta (no-op) or repairs a crash that
    landed between the fact append and the rollup refresh. Its cost is
    delta-sized either way.

    ``mode="upsert"`` (with ``key_cols``) makes each micro-batch a MERGE
    instead of an append — streaming CDC where late batches CORRECT
    earlier rows rather than duplicating them (Iceberg's streaming
    upsert). The batch-id stamp gives the same exactly-once replay
    guard; note upsert commits are invisible to ``incremental_scan``
    (overwrite semantics), so changelog consumers should use
    ``table_diff``. Not combinable with ``rollup_table`` for the same
    reason."""
    from gmft_spark.plans import snapshots as S

    if mode == "upsert" and rollup_table:
        raise ValueError(
            "upsert commits carry no append changelog — the rollup "
            "refresh would never see them; use table_diff downstream"
        )

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        committed = any(
            s["summary"].get("stream_batch_id") == batch_id
            for s in S.snapshots(table_dir)
        )
        if not committed:
            if mode == "upsert":
                S.commit_upsert(
                    batch_df.sparkSession,
                    batch_df,
                    table_dir,
                    key_cols=key_cols or [],
                    summary_extra={"stream_batch_id": batch_id},
                )
            else:
                S.commit_append(
                    batch_df.sparkSession,
                    batch_df,
                    table_dir,
                    summary_extra={"stream_batch_id": batch_id},
                )
        if rollup_table:
            from gmft_spark.plans.rollup import refresh_rollup

            refresh_rollup(
                batch_df.sparkSession,
                table_dir,
                rollup_table,
                keys=rollup_keys or [],
                sum_cols=rollup_sums or [],
            )

    return _commit


def run_snapshot_sink(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    rollup_table: str | None = None,
    rollup_keys: list[str] | None = None,
    rollup_sums: list[str] | None = None,
) -> None:
    """Drain the stream into a snapshot table (one atomic snapshot per
    micro-batch, exactly-once via the batch-id stamp), availableNow.
    Downstream consumers read the table's changelog with
    ``snapshots.incremental_scan`` — streaming in, incremental batch
    out, no duplicate rows across failures. ``rollup_table`` keeps a
    grouped aggregate fresh per micro-batch (see
    ``snapshot_batch_committer``)."""
    q = (
        stream_df.writeStream.foreachBatch(
            snapshot_batch_committer(
                table_dir, rollup_table, rollup_keys, rollup_sums
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

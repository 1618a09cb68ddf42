"""Transcript-table sources.

The engine's input contract is an Iceberg/parquet table of multi-turn
transcripts ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)`` bucketed on ``conv_id`` (BASELINE.json
``input_hint``). This module builds that table two ways:

* ``transcripts_from_documents`` — derives a deterministic transcript
  corpus from the driver-provided ``documents`` parquet (so the smoke /
  correctness runs consume the official test data);
* ``synthesize_transcripts`` — generates an arbitrary-size corpus with a
  heavy-tailed turns-per-conversation distribution (skew testing / bench).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def transcripts_from_documents(
    spark: SparkSession, sf_dir: str, sample_mod: int | None = None
) -> DataFrame:
    """Deterministic transcripts derived from ``{sf_dir}/documents.parquet``:
    conversations are keyed by document source, turns ordered by doc_id.

    ``sample_mod`` keeps every ``sample_mod``-th document (doc_id % mod == 0)
    — the correctness-gate knob: parity scenes are i.i.d. per turn, so a
    deterministic subsample binds the same semantics at 1/mod the cost. The
    DuckDB twin is ``operators.scene_sql.sampled(sql, mod)`` (same
    predicate, pushed into the seeds CTE); both sides MUST use the same mod."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if sample_mod and sample_mod > 1:
        docs = docs.filter(F.col("doc_id") % sample_mod == 0)
    return docs.select(
        F.concat(F.lit("conv-"), F.col("source"), F.lit("-"), (F.col("doc_id") % 16).cast("string")).alias("conv_id"),
        (F.col("doc_id") / 16).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 0, "user")
        .when(F.col("doc_id") % 3 == 1, "assistant")
        .otherwise("tool")
        .alias("role"),
        F.col("text"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("pdf_reader")).alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("doc_id"))).alias("ts"),
    )


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    turns_per_conv: int = 50,
    skew_factor: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic transcript corpus generated distributively
    with ``spark.range`` (never collected on the driver). ``skew_factor``
    adds one pathological conversation with ``skew_factor`` extra turns to
    exercise salting."""
    total = n_convs * turns_per_conv
    base = spark.range(0, total, 1, partitions or spark.sparkContext.defaultParallelism)
    t = base.select(
        F.concat(F.lit("conv-"), (F.col("id") % n_convs).cast("string")).alias("conv_id"),
        (F.col("id") / n_convs).cast("int").alias("turn_idx"),
        F.when(F.col("id") % 2 == 0, "user").otherwise("assistant").alias("role"),
        F.concat(F.lit("turn payload "), F.col("id").cast("string")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("id"))
        ).alias("ts"),
    )
    if skew_factor > 0:
        hot = spark.range(0, skew_factor, 1, partitions or 8).select(
            F.lit("conv-hot").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit("assistant").alias("role"),
            F.concat(F.lit("hot payload "), F.col("id").cast("string")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            (
                F.lit("2026-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=F.col("id"))
            ).alias("ts"),
        )
        t = t.unionByName(hot)
    return t

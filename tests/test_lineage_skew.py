"""Checkpoint/resume lineage and skew-safe assembly tests."""

import pytest

from pyspark.sql import functions as F

from gmft_spark.operators.extract import extract_tables
from gmft_spark.plans.lineage import (
    completed_buckets,
    resume_filter,
    write_results_with_lineage,
)
from gmft_spark.plans.skew import assemble_conversation_text, salted_repartition
from gmft_spark.sources.transcripts import synthesize_transcripts


def test_lineage_write_and_resume(spark, tmp_path):
    out = str(tmp_path / "sink")
    transcripts = synthesize_transcripts(spark, n_convs=8, turns_per_conv=4)
    results = extract_tables(transcripts)
    lineage = write_results_with_lineage(spark, results, out, n_buckets=8, run_id="r1")
    lrows = lineage.collect()
    assert sum(r["n_tables"] for r in lrows) == results.count()
    # ok/error tallies partition the table count
    assert sum(r["n_ok"] + r["n_error"] for r in lrows) == sum(
        r["n_tables"] for r in lrows
    )

    done = completed_buckets(spark, out)
    assert done  # some buckets completed

    # resume: everything already done → nothing left to compute
    remaining = resume_filter(spark, transcripts, out, n_buckets=8)
    assert remaining.count() == 0

    # a fresh sink resumes with the full input
    fresh = resume_filter(spark, transcripts, str(tmp_path / "other"), n_buckets=8)
    assert fresh.count() == transcripts.count()


def test_resume_skips_only_completed(spark, tmp_path):
    out = str(tmp_path / "sink2")
    transcripts = synthesize_transcripts(spark, n_convs=6, turns_per_conv=3)
    # complete only buckets of the first half of conversations
    first_half = transcripts.filter(F.col("conv_id").isin("conv-0", "conv-1", "conv-2"))
    write_results_with_lineage(
        spark, extract_tables(first_half), out, n_buckets=16, run_id="r1"
    )
    remaining = resume_filter(spark, transcripts, out, n_buckets=16)
    rem_convs = {r["conv_id"] for r in remaining.select("conv_id").distinct().collect()}
    done_convs = {"conv-0", "conv-1", "conv-2"}
    # completed conversations never reappear (no recompute)
    assert rem_convs.isdisjoint(done_convs)
    # every conversation whose bucket isn't shared with a done conv remains
    assert remaining.count() > 0


def test_salted_repartition_bounds_hot_conversation(spark):
    t = synthesize_transcripts(
        spark, n_convs=4, turns_per_conv=4, skew_factor=3000
    )
    salted = salted_repartition(t, num_partitions=8, turns_per_salt=256)
    # the hot conversation spreads over ceil(3000/256)=12 salt groups
    n_salts = (
        salted.filter(F.col("conv_id") == "conv-hot")
        .select("salt")
        .distinct()
        .count()
    )
    assert n_salts == 12


def test_assemble_conversation_text_stable_order(spark):
    t = synthesize_transcripts(spark, n_convs=3, turns_per_conv=5)
    results = extract_tables(t)
    assembled = assemble_conversation_text(results, turns_per_salt=2)
    rows = {r["conv_id"]: r["full_text"] for r in assembled.collect()}
    # oracle: order rows by turn_idx and join
    expected = (
        results.orderBy("turn_idx", "table_id")
        .groupBy("conv_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "table_id", "table_text"))
                    ),
                    lambda s: s["table_text"],
                ),
            ).alias("e")
        )
        .collect()
    )
    for r in expected:
        assert rows[r["conv_id"]] == r["e"]


def test_lineage_carries_extraction_metrics(spark, tmp_path):
    out = str(tmp_path / "metrics_sink")
    t = synthesize_transcripts(spark, n_convs=6, turns_per_conv=4)
    lineage = write_results_with_lineage(
        spark, extract_tables(t), out, n_buckets=8, run_id="rm"
    )
    cols = set(lineage.columns)
    assert {"total_rows", "n_with_skipped_text", "min_lowest_iob",
            "n_with_nms_removals"} <= cols
    rows = lineage.collect()
    assert sum(r["total_rows"] for r in rows) > 0

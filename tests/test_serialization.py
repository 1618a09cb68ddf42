"""S7: JSON round-trip + reference golden ingest."""

import os

import pytest

from gmft_spark.operators.extract import extract_tables
from gmft_spark.sources.serial import (
    REFERENCE_TABLES_JSON,
    load_reference_predictions,
    results_from_json,
    results_to_json,
)
from gmft_spark.sources.transcripts import synthesize_transcripts


def test_results_json_roundtrip(spark):
    t = synthesize_transcripts(spark, n_convs=3, turns_per_conv=3)
    results = extract_tables(t)
    serialized = results_to_json(results)
    back = results_from_json(serialized)
    a = {
        (r["conv_id"], r["turn_idx"], r["table_id"]): (r["csv"], r["n_rows"])
        for r in results.collect()
    }
    b = {
        (r["conv_id"], r["turn_idx"], r["table_id"]): (r["csv"], r["n_rows"])
        for r in back.collect()
    }
    assert a == b


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_TABLES_JSON),
    reason="reference fixtures not present (standalone repo)",
)
def test_reference_golden_ingest(spark):
    """The reference's 40 serialized golden tables load and survive the
    confidence-filter stage with plausible structure."""
    from pyspark.sql import functions as F

    preds = load_reference_predictions(spark)
    assert preds is not None
    n_tables = preds.select("key").distinct().count()
    assert n_tables >= 40

    kept = preds.filter(
        F.col("score")
        >= F.when(F.col("label").isin(4, 5), 0.5)
        .when(F.col("label") == 6, 99.0)
        .otherwise(0.3)
    )
    per_table = kept.groupBy("key").agg(
        F.sum(F.when(F.col("label") == 2, 1).otherwise(0)).alias("n_rows"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("n_cols"),
    )
    bad = per_table.filter((F.col("n_rows") == 0) | (F.col("n_cols") == 0)).count()
    assert bad == 0  # every golden table has rows and columns

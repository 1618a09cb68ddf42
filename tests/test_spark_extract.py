"""Spark pipeline tests: the mapInPandas extraction must equal the
single-process kernel oracle per turn, under stable (conv_id, turn_idx)
ordering — the north-rule per-row invariant."""

import numpy as np

from gmft_spark.config import ExtractConfig
from gmft_spark.operators.extract import extract_tables, extract_turn
from gmft_spark.sources.transcripts import synthesize_transcripts

from tests.fixtures_tiny import (
    TINY_EXPECTED_CSV,
    TINY_PRED_BOXES,
    TINY_PRED_LABELS,
    TINY_PRED_SCORES,
    TINY_TABLE_BBOX,
    TINY_WORDS,
)


def test_per_turn_text_equality(spark):
    """Every Spark-extracted table equals the single-process extraction of
    the same turn, byte for byte."""
    transcripts = synthesize_transcripts(spark, n_convs=12, turns_per_conv=6)
    got = (
        extract_tables(transcripts)
        .orderBy("conv_id", "turn_idx", "table_id")
        .collect()
    )
    assert len(got) >= 72  # ≥1 table per turn

    cfg = ExtractConfig()
    # single-process oracle over every (conv, turn)
    seen_keys = {(r["conv_id"], r["turn_idx"]) for r in got}
    expected = {}
    for conv_id, turn_idx in seen_keys:
        for t in extract_turn(conv_id, turn_idx, cfg):
            expected[(conv_id, turn_idx, t["table_id"])] = t

    assert len(expected) == len(got)
    for r in got:
        e = expected[(r["conv_id"], r["turn_idx"], r["table_id"])]
        assert r["status"] == e["status"]
        assert r["csv"] == e["csv"], (r["conv_id"], r["turn_idx"])
        assert r["table_text"] == e["table_text"]
        assert list(r["columns"] or []) == list(e["columns"] or [])


def test_statuses_mostly_ok(spark):
    transcripts = synthesize_transcripts(spark, n_convs=10, turns_per_conv=5)
    results = extract_tables(transcripts)
    counts = {r["status"]: r["n"] for r in
              results.groupBy("status").count().withColumnRenamed("count", "n").collect()}
    assert counts.get("ok", 0) > 0
    # scenes include ~2% deliberately degenerate tables → error rows, not
    # exceptions; they must be rare and carry a message
    total = sum(counts.values())
    assert counts.get("error", 0) / total < 0.10
    errs = results.filter(results.status == "error").limit(3).collect()
    for e in errs:
        assert e["message"]
        assert e["csv"] is None


def test_tiny_golden_through_spark(spark):
    """The reference's tiny.pdf fixture pushed through the same Arrow batch
    path used in production (pandas in → kernel → pandas out)."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    from gmft_spark.kernel.table import extract_table

    word_boxes = np.array([w[:4] for w in TINY_WORDS], dtype=np.float64)
    texts = [w[4] for w in TINY_WORDS]

    def run(batches):
        for b in batches:
            out = []
            for _ in b.itertuples():
                res = extract_table(
                    TINY_PRED_SCORES,
                    TINY_PRED_LABELS,
                    TINY_PRED_BOXES,
                    word_boxes,
                    texts,
                    TINY_TABLE_BBOX,
                    ExtractConfig(),
                )
                out.append({"csv": res.csv})
            yield pd.DataFrame(out)

    df = spark.range(3).withColumnRenamed("id", "n")
    schema = StructType([StructField("csv", StringType())])
    rows = df.mapInPandas(run, schema=schema).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["csv"] == TINY_EXPECTED_CSV


def test_no_shuffle_in_extract_plan(spark):
    """The extraction stage must be a narrow map — no Exchange in the plan."""
    transcripts = synthesize_transcripts(spark, n_convs=4, turns_per_conv=4)
    plan = extract_tables(transcripts)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

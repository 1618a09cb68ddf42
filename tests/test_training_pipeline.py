"""End-to-end training-data curation: HTML → content → score → dedup →
lineage sink."""

from pyspark.sql import functions as F

from gmft_spark.operators.html_content import synthesize_html_transcripts
from gmft_spark.operators.training_pipeline import (
    curate,
    dedup_keep_best,
    score_documents,
)
from gmft_spark.operators.html_content import extract_html_content
from gmft_spark.plans.lineage import write_results_with_lineage


def test_curation_end_to_end(spark, tmp_path):
    t = synthesize_html_transcripts(spark, n_convs=10, turns_per_conv=4)
    curated = curate(t, min_quality=0.1)
    rows = curated.collect()
    assert len(rows) > 0
    # no duplicate fingerprints survive
    fps = [r["fingerprint"] for r in rows]
    assert len(fps) == len(set(fps))
    for r in rows[:5]:
        assert r["quality"] > 0
        assert "Main paragraph" in r["main_text"]

    # the curated set sinks with lineage (status column synthesized)
    out = str(tmp_path / "curated")
    sink = curated.withColumn("status", F.lit("ok"))
    lineage = write_results_with_lineage(spark, sink, out, n_buckets=8, run_id="c1")
    assert sum(r["n_tables"] for r in lineage.collect()) == len(rows)


def test_dedup_keeps_highest_quality(spark):
    t = synthesize_html_transcripts(spark, n_convs=4, turns_per_conv=2)
    scored = score_documents(extract_html_content(t))
    # force duplicates: zero out the distinguishing payload
    forced = scored.withColumn("fingerprint", F.lit("same"))
    kept = dedup_keep_best(forced).collect()
    assert len(kept) == 1
    best = max(scored.collect(), key=lambda r: (r["quality"], ))
    assert kept[0]["quality"] == best["quality"]

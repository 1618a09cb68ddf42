"""Shard export job (jobs/run_shard_export.py): curated corpus →
one gzipped JSONL file per shard, rows in sharder pos order,
byte-stable across re-exports."""

import glob
import gzip
import json

from pyspark.sql import functions as F

import jobs.run_shard_export as J


def _corpus(spark, n=60):
    # the shape run_web_pipeline writes: shard/pos from the
    # deterministic sharder over synthetic doc ids
    from gmft_spark.operators.textstats import shard_training_corpus

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body "), F.col("id").cast("string")).alias(
            "text"
        ),
        F.lit("en").alias("lang"),
        F.concat(F.lit("https://x.example/"), F.col("id").cast("string"))
        .alias("url"),
    )
    return base


def test_shard_export_order_and_roundtrip(spark, tmp_path):
    from gmft_spark.operators.textstats import shard_training_corpus

    src = tmp_path / "corpus"
    base = _corpus(spark)
    # derive real shard/pos by staging the docs where the sharder reads
    stage = tmp_path / "stage"
    base.select(
        "doc_id", "text",
        F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
    ).write.parquet(str(stage / "documents.parquet"))
    shards = shard_training_corpus(spark, str(stage))
    corpus = base.join(
        shards.select("doc_id", "shard", "pos", "n_tokens"), "doc_id"
    )
    corpus.write.parquet(str(src))

    out = tmp_path / "shards"
    assert (
        J.main(["--input", str(src), "--output", str(out)]) == 0
    )
    files = sorted(glob.glob(str(out / "shard=*" / "*.txt.gz")))
    assert files, "no shard files written"
    seen = {}
    for f in files:
        shard = int(f.split("shard=")[1].split("/")[0])
        with gzip.open(f, "rt") as fh:
            rows = [json.loads(line) for line in fh]
        seen[shard] = rows
    # every doc exactly once, text round-trips
    all_ids = [r["doc_id"] for rows in seen.values() for r in rows]
    assert sorted(all_ids) == list(range(60))
    texts = {r["doc_id"]: r["text"] for rows in seen.values() for r in rows}
    assert texts[7] == "text body 7"
    # rows inside each file follow the sharder's pos order exactly
    expect = {
        r["shard"]: [x["doc_id"] for x in sorted(
            [
                {"doc_id": q["doc_id"], "pos": q["pos"], "shard": q["shard"]}
                for q in corpus.collect()
                if q["shard"] == r["shard"]
            ],
            key=lambda d: d["pos"],
        )]
        for r in corpus.select("shard").distinct().collect()
    }
    for shard, rows in seen.items():
        assert [r["doc_id"] for r in rows] == expect[shard], shard
    # one file per shard
    assert len(files) == len(seen) == len(expect)


def test_shard_export_guards(spark, tmp_path):
    import pytest

    bad = tmp_path / "bad"
    spark.range(3).write.parquet(str(bad))
    with pytest.raises(SystemExit):
        J.main(["--input", str(bad), "--output", str(tmp_path / "o")])

"""Stateful streaming dedup: duplicates dropped within a batch AND across
micro-batches/restarts (state persists in the checkpoint)."""

import datetime

from gmft_spark.streaming.dedup_stream import stream_dedup
from gmft_spark.streaming.pipeline import TRANSCRIPT_SCHEMA, stream_transcripts


def _rows(spark, specs):
    """specs: list of (conv_id, turn_idx, text)."""
    ts = datetime.datetime(2026, 1, 1)
    data = [(c, t, "user", x, None, ts) for c, t, x in specs]
    return spark.createDataFrame(data, TRANSCRIPT_SCHEMA)


def _drain(spark, src, out, ckpt):
    q = (
        stream_dedup(stream_transcripts(spark, src))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_dedup_within_and_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: one in-batch duplicate pair
    _rows(
        spark,
        [
            ("c1", 0, "alpha payload"),
            ("c1", 1, "beta payload"),
            ("c2", 0, "alpha payload"),  # dup of c1/0
            ("c2", 1, "gamma payload"),
        ],
    ).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)
    got1 = spark.read.parquet(out)
    assert got1.count() == 3
    assert got1.filter(got1.text == "alpha payload").count() == 1

    # batch 2: replays of batch-1 texts plus one new text
    _rows(
        spark,
        [
            ("c3", 0, "beta payload"),   # dup across batches
            ("c3", 1, "delta payload"),  # new
            ("c3", 2, "gamma payload"),  # dup across batches
        ],
    ).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)
    got2 = spark.read.parquet(out)
    assert got2.count() == 4  # only 'delta payload' was added
    texts = {r["text"] for r in got2.collect()}
    assert texts == {
        "alpha payload",
        "beta payload",
        "gamma payload",
        "delta payload",
    }

"""Stateful conversation assembly: a conversation closes only when the
watermark passes its quiet period; out-of-order turns assemble in
turn_idx order; state survives across micro-batch drains."""

import datetime

from gmft_spark.streaming.conversation_state import (
    stream_assemble_conversations,
)
from gmft_spark.streaming.pipeline import TRANSCRIPT_SCHEMA, stream_transcripts


def _rows(spark, specs):
    """specs: (conv_id, turn_idx, text, minutes-offset)."""
    base = datetime.datetime(2026, 1, 1)
    data = [
        (c, t, "user", x, None, base + datetime.timedelta(minutes=m))
        for c, t, x, m in specs
    ]
    return spark.createDataFrame(data, TRANSCRIPT_SCHEMA)


def _drain(spark, src, out, ckpt):
    q = (
        stream_assemble_conversations(stream_transcripts(spark, src))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_conversation_closes_on_quiet_period(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: conv A's turns (out of order) around t=0..2min
    _rows(
        spark,
        [
            ("A", 1, "second", 2),
            ("A", 0, "first", 0),
            ("A", 2, "third", 1),
        ],
    ).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)
    try:
        n0 = spark.read.parquet(out).count()
    except Exception:
        n0 = 0
    assert n0 == 0  # watermark hasn't passed A's quiet period yet

    # batch 2: a much later conversation advances the watermark far past
    # A's (last ts + GAP) -> A must emit, fully assembled in turn order
    _rows(spark, [("B", 0, "later conv", 60)]).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)
    got = {r["conv_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"A"}
    assert got["A"]["n_turns"] == 3
    assert got["A"]["full_text"] == "first\nsecond\nthird"

    # batch 3: push the watermark past B's quiet period -> B emits too
    _rows(spark, [("C", 0, "even later", 180)]).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)
    got = {r["conv_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"A", "B"}
    assert got["B"]["full_text"] == "later conv"

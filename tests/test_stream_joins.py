"""Stream-stream join: availableNow drain must equal the batch join, and
a view below the watermark must be dropped from join state."""

import datetime as dt

from pyspark.sql import Row

from gmft_spark.streaming.joins import (
    EVENT_SCHEMA,
    click_view_attribution,
    stream_events,
)

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _ev(eid, sec, user, kind):
    return Row(
        event_id=eid, ts=T0 + dt.timedelta(seconds=sec), user_id=user,
        event_type=kind, value=0.0, props="",
    )


def _drain(spark, src, out, ckpt):
    q = (
        click_view_attribution(stream_events(spark, src))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_join_matches_batch(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    rows = [
        _ev(1, 0, 7, "view"),
        _ev(2, 30, 7, "view"),
        _ev(3, 50, 7, "click"),   # joins views 1 and 2
        _ev(4, 9000, 7, "click"), # outside the 1h window: joins nothing
        _ev(5, 40, 8, "view"),
        _ev(6, 45, 8, "click"),   # joins view 5 (different user isolated)
        _ev(7, 41, 9, "click"),   # no views for user 9
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(src)
    _drain(spark, src, out, ckpt)
    got = {
        (r["click_id"], r["view_id"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["click_id"], r["view_id"])
        for r in click_view_attribution(spark.read.parquet(src)).collect()
    }
    assert got == batch == {(3, 1), (3, 2), (6, 5)}


def test_stream_join_drops_view_below_watermark(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("in2", "out2", "ckpt2"))
    spark.createDataFrame(
        [_ev(1, 86400, 1, "view")], EVENT_SCHEMA
    ).write.parquet(src)
    _drain(spark, src, out, ckpt)  # watermark advances to 86400s - 2h

    # a late view + a click that WOULD match it in batch semantics: the
    # view is below the watermark, so streaming state never admits it
    spark.createDataFrame(
        [_ev(2, 10, 1, "view"), _ev(3, 30, 1, "click")], EVENT_SCHEMA
    ).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)

    batch = click_view_attribution(spark.read.parquet(src))
    assert batch.count() == 1  # batch semantics would attribute it
    assert spark.read.parquet(out).count() == 0  # streaming dropped it

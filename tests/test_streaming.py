"""Streaming pipeline: availableNow drain must equal the batch result."""

from gmft_spark.operators.extract import extract_tables
from gmft_spark.sources.transcripts import synthesize_transcripts
from gmft_spark.streaming.pipeline import (
    run_available_now,
    stream_extract,
    stream_transcripts,
    stream_turn_metrics,
)


def test_stream_extract_matches_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    t = synthesize_transcripts(spark, n_convs=6, turns_per_conv=4)
    t.write.parquet(src)

    stream = stream_extract(stream_transcripts(spark, src))
    assert stream.isStreaming
    run_available_now(stream, out, ckpt)

    got = spark.read.parquet(out)
    batch = extract_tables(spark.read.parquet(src))
    assert got.count() == batch.count()
    g = {(r["conv_id"], r["turn_idx"], r["table_id"]): r["csv"] for r in got.collect()}
    b = {(r["conv_id"], r["turn_idx"], r["table_id"]): r["csv"] for r in batch.collect()}
    assert g == b


def test_stream_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Second drain with the SAME checkpoint processes only files that
    arrived after the first — nothing reprocessed, nothing dropped."""
    src = str(tmp_path / "in3")
    out = str(tmp_path / "out3")
    ckpt = str(tmp_path / "ckpt3")

    first = synthesize_transcripts(spark, n_convs=4, turns_per_conv=3)
    first.write.parquet(src)
    run_available_now(stream_extract(stream_transcripts(spark, src)), out, ckpt)
    n_first = spark.read.parquet(out).count()
    assert n_first == extract_tables(first).count()

    from pyspark.sql import functions as F

    second = synthesize_transcripts(spark, n_convs=4, turns_per_conv=3).withColumn(
        "conv_id", F.concat(F.lit("late-"), F.col("conv_id"))
    )
    second.write.mode("append").parquet(src)
    run_available_now(stream_extract(stream_transcripts(spark, src)), out, ckpt)

    got = spark.read.parquet(out)
    batch = extract_tables(spark.read.parquet(src))
    assert got.count() == batch.count()  # no reprocessing, no loss
    keys = [(r["conv_id"], r["turn_idx"], r["table_id"]) for r in got.collect()]
    assert len(keys) == len(set(keys))


def test_stream_metrics_watermarked(spark, tmp_path):
    src = str(tmp_path / "in2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    synthesize_transcripts(spark, n_convs=4, turns_per_conv=6).write.parquet(src)
    metrics = stream_turn_metrics(stream_transcripts(spark, src))
    q = (
        metrics.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # watermark closes no window in a single availableNow batch unless data
    # spans it; just assert the sink schema landed and the query ran clean
    df = spark.read.parquet(out)
    assert {"window", "role", "n_turns"} <= set(df.columns)


def test_watermark_drops_late_rows_across_drains(spark, tmp_path):
    """Three availableNow drains against one checkpoint pin the actual
    late-data contract: the watermark is carried in the checkpoint, a
    row older than it is DROPPED from its (already closed) window, and
    append mode emits a window exactly once. Drain 1 seeds window
    [10:00,10:01) with 2 rows; drain 2 advances the watermark past the
    window via a much later row; drain 3 delivers a late row for the
    closed window — the emitted count must stay 2."""
    import datetime as dt

    from pyspark.sql import Row, functions as F

    src = str(tmp_path / "in4")
    out = str(tmp_path / "out4")
    ckpt = str(tmp_path / "ckpt4")

    def turn(ts, idx):
        return Row(
            conv_id="c0", turn_idx=idx, role="user", text="x", tool="",
            ts=dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(seconds=ts),
        )

    def drain():
        metrics = stream_turn_metrics(stream_transcripts(spark, src))
        q = (
            metrics.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    from gmft_spark.streaming.pipeline import TRANSCRIPT_SCHEMA as sch

    spark.createDataFrame([turn(5, 0), turn(30, 1)], sch).write.parquet(src)
    drain()
    # drain 2: a row 2h later pushes the watermark (10 min) far past the
    # 10:00 window
    spark.createDataFrame([turn(7200, 2)], sch).write.mode("append").parquet(src)
    drain()
    # drain 3: a LATE row inside the 10:00 window, now below the watermark
    spark.createDataFrame([turn(40, 3)], sch).write.mode("append").parquet(src)
    drain()

    got = spark.read.parquet(out)
    w0 = got.filter(
        F.col("window.start") == dt.datetime(2024, 1, 1, 10, 0, 0)
    ).collect()
    assert len(w0) == 1, f"window emitted {len(w0)} times"
    assert w0[0]["n_turns"] == 2  # the late drain-3 row was dropped


def test_snapshot_sink_commits_batches_exactly_once(spark, tmp_path):
    """foreachBatch → snapshot-table sink: one atomic snapshot per
    micro-batch, replayed batch ids skipped, changelog consumable."""
    from gmft_spark.plans import snapshots as S
    from gmft_spark.streaming.pipeline import (
        run_snapshot_sink,
        snapshot_batch_committer,
    )

    src = str(tmp_path / "in4")
    tbl = str(tmp_path / "tbl4")
    ckpt = str(tmp_path / "ckpt4")

    t = synthesize_transcripts(spark, n_convs=5, turns_per_conv=3)
    t.write.parquet(src)
    run_snapshot_sink(stream_transcripts(spark, src), tbl, ckpt)

    head = S.current_snapshot_id(tbl)
    assert head is not None
    assert S.read_table(spark, tbl).count() == t.count()
    batch_ids = [
        s["summary"].get("stream_batch_id") for s in S.snapshots(tbl)
    ]
    assert all(b is not None for b in batch_ids)

    # simulate foreachBatch's at-least-once replay: re-deliver an
    # already-committed batch id — no new snapshot, no duplicate rows
    commit = snapshot_batch_committer(tbl)
    commit(spark.read.parquet(src), batch_ids[-1])
    assert S.current_snapshot_id(tbl) == head
    assert S.read_table(spark, tbl).count() == t.count()

    # a genuinely new batch id commits, and the changelog sees only it
    commit(spark.read.parquet(src).limit(2), max(batch_ids) + 1)
    assert S.current_snapshot_id(tbl) == head + 1
    assert S.incremental_scan(spark, tbl, since_snapshot_id=head).count() == 2


def test_snapshot_sink_second_drain_appends_only_new_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from gmft_spark.plans import snapshots as S
    from gmft_spark.streaming.pipeline import run_snapshot_sink

    src = str(tmp_path / "in5")
    tbl = str(tmp_path / "tbl5")
    ckpt = str(tmp_path / "ckpt5")

    first = synthesize_transcripts(spark, n_convs=3, turns_per_conv=2)
    first.write.parquet(src)
    run_snapshot_sink(stream_transcripts(spark, src), tbl, ckpt)
    n1 = S.read_table(spark, tbl).count()
    assert n1 == first.count()

    second = synthesize_transcripts(spark, n_convs=2, turns_per_conv=2).withColumn(
        "conv_id", F.concat(F.lit("late-"), F.col("conv_id"))
    )
    second.write.mode("append").parquet(src)
    run_snapshot_sink(stream_transcripts(spark, src), tbl, ckpt)
    t = S.read_table(spark, tbl)
    assert t.count() == n1 + second.count()
    keys = [(r["conv_id"], r["turn_idx"]) for r in t.collect()]
    assert len(keys) == len(set(keys))


def test_snapshot_sink_keeps_a_rollup_fresh_per_batch(spark, tmp_path):
    """foreachBatch sink with rollup_table: the aggregate tracks the fact
    table across drains, replays leave it unchanged, and a crash that
    landed the fact append but not the refresh is repaired on replay."""
    from pyspark.sql import functions as F

    from gmft_spark.plans import snapshots as S
    from gmft_spark.plans.rollup import last_refreshed_snapshot
    from gmft_spark.streaming.pipeline import (
        run_snapshot_sink,
        snapshot_batch_committer,
        stream_transcripts,
    )

    src = str(tmp_path / "in6")
    tbl = str(tmp_path / "tbl6")
    roll = str(tmp_path / "roll6")
    ckpt = str(tmp_path / "ckpt6")

    def _recompute():
        return {
            r["conv_id"]: (r["n"], r["t"])
            for r in S.read_table(spark, tbl)
            .groupBy("conv_id")
            .agg(F.count("*").alias("n"), F.sum("turn_idx").alias("t"))
            .collect()
        }

    def _state():
        return {
            r["conv_id"]: (r["n_rows"], r["sum_turn_idx"])
            for r in S.read_table(spark, roll).collect()
        }

    synthesize_transcripts(spark, n_convs=4, turns_per_conv=3).write.parquet(src)
    kw = dict(rollup_table=roll, rollup_keys=["conv_id"], rollup_sums=["turn_idx"])
    run_snapshot_sink(stream_transcripts(spark, src), tbl, ckpt, **kw)
    assert _state() == _recompute()

    # second drain over appended input refreshes incrementally
    synthesize_transcripts(spark, n_convs=6, turns_per_conv=2).filter(
        F.col("conv_id").isin("conv-4", "conv-5")
    ).write.mode("append").parquet(src)
    run_snapshot_sink(stream_transcripts(spark, src), tbl, ckpt, **kw)
    assert _state() == _recompute() and len(_state()) == 6

    # replayed batch: fact table and rollup both unchanged
    commit = snapshot_batch_committer(tbl, **kw)
    replay_id = max(
        s["summary"].get("stream_batch_id", -1) for s in S.snapshots(tbl)
    )
    fact_head, roll_head = S.current_snapshot_id(tbl), S.current_snapshot_id(roll)
    commit(S.read_table(spark, tbl).limit(3), replay_id)
    assert S.current_snapshot_id(tbl) == fact_head
    assert S.current_snapshot_id(roll) == roll_head

    # crash repair: a fact append whose refresh never ran catches up on
    # the next delivered batch, replayed or not
    S.commit_append(
        spark,
        S.read_table(spark, tbl).limit(2),
        tbl,
        summary_extra={"stream_batch_id": replay_id + 1},
    )
    commit(S.read_table(spark, tbl).limit(2), replay_id + 1)  # replay: append skipped
    assert last_refreshed_snapshot(roll) == S.current_snapshot_id(tbl)
    assert _state() == _recompute()


def test_session_windows_merge_across_micro_batches(spark, tmp_path):
    """Turns of one session split across two micro-batches merge into a
    single session row (state-store window merge), a >gap pause opens a
    new session, and the streamed result equals the same session_window
    computed in batch mode."""
    import os

    from pyspark.sql import functions as F

    from gmft_spark.streaming.pipeline import (
        TRANSCRIPT_SCHEMA,
        run_available_now,
        stream_session_metrics,
    )

    src = str(tmp_path / "in7")
    out = str(tmp_path / "out7")
    ckpt = str(tmp_path / "ckpt7")
    os.makedirs(src)

    def _rows(rows):
        return spark.createDataFrame(
            [
                (c, i, "user", "t", None, f"2026-01-01 00:{mm:02d}:{ss:02d}")
                for c, i, mm, ss in rows
            ],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts_s string",
        ).select(
            "conv_id", "turn_idx", "role", "text", "tool",
            F.col("ts_s").cast("timestamp").alias("ts"),
        )

    # batch 1: session 1 starts; batch 2: continues it (<2 min gap),
    # then a >2 min pause opens session 2; a far-future row advances the
    # watermark so both sessions close and emit in append mode
    _rows([("conv-1", 0, 0, 0), ("conv-1", 1, 1, 0)]).coalesce(1).write.parquet(
        src + "/b1"
    )
    _rows(
        [("conv-1", 2, 2, 30), ("conv-1", 3, 10, 0), ("flush", 9, 50, 0)]
    ).coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    run_available_now(stream_session_metrics(stream), out, ckpt)
    got = sorted(
        (r["conv_id"], r["n_turns"], r["first_turn"], r["last_turn"])
        for r in spark.read.parquet(out).filter("conv_id = 'conv-1'").collect()
    )
    # session 1 merged turns 0-2 across the batch boundary
    assert got == [("conv-1", 1, 3, 3), ("conv-1", 3, 0, 2)]

    # differential: the batch-mode session_window over the same input
    batch = stream_session_metrics(
        spark.read.schema(TRANSCRIPT_SCHEMA).parquet(src + "/*")
    )
    expect = sorted(
        (r["conv_id"], r["n_turns"], r["first_turn"], r["last_turn"])
        for r in batch.filter("conv_id = 'conv-1'").collect()
    )
    assert got == expect


def test_snapshot_sink_upsert_mode_corrects_rows(spark, tmp_path):
    """Streaming CDC: micro-batches MERGE on (conv_id, turn_idx) — a
    later batch carrying corrected rows REPLACES the earlier ones, and a
    replayed batch id is still skipped."""
    from pyspark.sql import functions as F

    from gmft_spark.plans import snapshots as S
    from gmft_spark.streaming.pipeline import (
        TRANSCRIPT_SCHEMA,
        run_available_now,
        snapshot_batch_committer,
        stream_transcripts,
    )
    import pytest

    src = str(tmp_path / "in8")
    tbl = str(tmp_path / "tbl8")
    ckpt = str(tmp_path / "ckpt8")

    def _batch(rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, "
            "tool string"
        ).withColumn("ts", F.lit("2026-01-01").cast("timestamp"))

    _batch([("c1", 0, "user", "v1", None),
            ("c1", 1, "user", "v1", None)]).coalesce(1).write.parquet(src + "/b1")
    q = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    )
    commit = snapshot_batch_committer(
        tbl, mode="upsert", key_cols=["conv_id", "turn_idx"]
    )

    def run():
        job = (q.writeStream.foreachBatch(commit)
               .option("checkpointLocation", ckpt)
               .trigger(availableNow=True).start())
        job.awaitTermination()

    run()
    assert {r["text"] for r in S.read_table(spark, tbl).collect()} == {"v1"}

    # correction batch: same keys, new payloads + one new row
    _batch([("c1", 0, "user", "v2", None),
            ("c1", 2, "user", "v2", None)]).coalesce(1).write.parquet(src + "/b2")
    run()
    t = {(r["turn_idx"], r["text"]) for r in S.read_table(spark, tbl).collect()}
    assert t == {(0, "v2"), (1, "v1"), (2, "v2")}  # replaced, not duplicated

    # replayed batch id: no new snapshot
    head = S.current_snapshot_id(tbl)
    last_id = max(s["summary"].get("stream_batch_id", -1)
                  for s in S.snapshots(tbl))
    commit(S.read_table(spark, tbl).limit(1), last_id)
    assert S.current_snapshot_id(tbl) == head

    # rollup is incompatible with upsert commits by construction
    with pytest.raises(ValueError):
        snapshot_batch_committer(tbl, rollup_table="x", mode="upsert")


def test_stream_static_dimension_join_matches_batch(spark, tmp_path):
    """Stream-static enrichment: a streaming fact joined to a static
    dimension broadcasts the dim per micro-batch and equals the batch
    join."""
    from pyspark.sql import functions as F

    from gmft_spark.streaming.pipeline import (
        run_available_now,
        stream_transcripts,
    )

    src = str(tmp_path / "in9")
    out = str(tmp_path / "out9")
    t = synthesize_transcripts(spark, n_convs=6, turns_per_conv=4)
    t.write.parquet(src)
    dim = t.groupBy("conv_id").agg(F.count("*").alias("conv_turns"))

    enriched = stream_transcripts(spark, src).join(
        F.broadcast(dim), "conv_id"
    ).select("conv_id", "turn_idx", "conv_turns")
    run_available_now(enriched, out, str(tmp_path / "ck9"))
    got = spark.read.parquet(out)
    assert got.count() == t.count()
    assert got.filter(F.col("conv_turns") != 4).count() == 0

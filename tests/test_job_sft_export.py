"""SFT export job entrypoint: end-to-end run over synthesized transcripts,
span/render consistency, lint gating, split partitioning, bucket resume."""

import os

from pyspark.sql import functions as F

from gmft_spark.sources.transcripts import synthesize_transcripts


def _write_input(spark, path, n_convs=12, turns=6):
    synthesize_transcripts(spark, n_convs=n_convs, turns_per_conv=turns).write.parquet(
        path
    )


def test_sft_export_end_to_end(spark, tmp_path, capsys):
    import jobs.run_sft_export as J

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _write_input(spark, src)
    assert (
        J.main(
            ["--input", src, "--output", out, "--buckets", "8",
             "--run-id", "t1"]
        )
        == 0
    )
    spans = spark.read.parquet(os.path.join(out, "turns", "results"))
    convs = spark.read.parquet(os.path.join(out, "conversations", "results"))
    assert spans.count() > 0 and convs.count() > 0

    # the offsets index the rendered string: reconstruct two turns
    r = {row["conv_id"]: row["rendered"] for row in convs.collect()}
    for row in spans.orderBy("conv_id", "turn_idx").limit(5).collect():
        seg = r[row["conv_id"]][row["start_char"] : row["end_char"]]
        assert seg.startswith(row["role"] + ": ")
        assert row["loss_mask"] == (1 if row["role"] == "assistant" else 0)

    # split is conversation-grain: each conv_id maps to exactly one split
    multi = (
        spans.groupBy("conv_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
    )
    assert multi.count() == 0
    assert set(convs.select("split").distinct().toPandas()["split"]) <= {
        "train",
        "val",
        "test",
    }

    # resume: all buckets complete -> clean no-op
    assert (
        J.main(["--input", src, "--output", out, "--buckets", "8", "--resume"])
        == 0
    )
    assert "nothing to do" in capsys.readouterr().out


def test_sft_export_lint_gate_drops_dirty_conversations(spark, tmp_path):
    import jobs.run_sft_export as J

    src = str(tmp_path / "in_l")
    t = synthesize_transcripts(spark, n_convs=6, turns_per_conv=4)
    # poison one conversation with an out-of-order wall clock
    dirty = F.when(
        (F.col("conv_id") == "conv-0") & (F.col("turn_idx") == 2),
        F.lit("2020-01-01 00:00:00").cast("timestamp"),
    ).otherwise(F.col("ts"))
    t.withColumn("ts", dirty).write.parquet(src)

    out1 = str(tmp_path / "gated")
    assert J.main(["--input", src, "--output", out1, "--buckets", "4"]) == 0
    gated = spark.read.parquet(os.path.join(out1, "turns", "results"))
    assert gated.filter(F.col("conv_id") == "conv-0").count() == 0
    assert gated.select("conv_id").distinct().count() == 5

    out2 = str(tmp_path / "kept")
    assert (
        J.main(
            ["--input", src, "--output", out2, "--buckets", "4",
             "--keep-dirty"]
        )
        == 0
    )
    kept = spark.read.parquet(os.path.join(out2, "turns", "results"))
    assert kept.filter(F.col("conv_id") == "conv-0").count() > 0


def test_sft_export_folds_tool_turns_unless_disabled(spark, tmp_path):
    import jobs.run_sft_export as J

    src = str(tmp_path / "in_f")
    t = synthesize_transcripts(spark, n_convs=4, turns_per_conv=6)
    # synthesize_transcripts emits only user/assistant; retag one turn per
    # conversation as a named tool turn so folding has work to do
    t = t.withColumn(
        "role",
        F.when(F.col("turn_idx") == 3, "tool").otherwise(F.col("role")),
    ).withColumn(
        "tool", F.when(F.col("turn_idx") == 3, "search").otherwise(F.col("tool"))
    )
    t.write.parquet(src)

    out_fold = str(tmp_path / "folded")
    assert J.main(["--input", src, "--output", out_fold, "--buckets", "4"]) == 0
    folded = spark.read.parquet(os.path.join(out_fold, "turns", "results"))
    assert folded.filter(F.col("role") == "tool").count() == 0
    convs = spark.read.parquet(
        os.path.join(out_fold, "conversations", "results")
    )
    assert all("[tool] " in r["rendered"] for r in convs.collect())

    out_raw = str(tmp_path / "raw")
    assert (
        J.main(
            ["--input", src, "--output", out_raw, "--buckets", "4",
             "--no-fold"]
        )
        == 0
    )
    raw = spark.read.parquet(os.path.join(out_raw, "turns", "results"))
    assert raw.filter(F.col("role") == "tool").count() > 0


def test_sft_export_resumes_conversations_after_crash_between_writes(
    spark, tmp_path, capsys
):
    """The two outputs resume independently: if a run dies after the span
    write but before the conversations write (simulated by deleting the
    conversations output), --resume rebuilds exactly the conversations,
    appending no duplicate span rows."""
    import shutil

    import jobs.run_sft_export as J

    src = str(tmp_path / "in_c")
    out = str(tmp_path / "out_c")
    _write_input(spark, src)
    assert J.main(["--input", src, "--output", out, "--buckets", "8"]) == 0
    spans_before = spark.read.parquet(
        os.path.join(out, "turns", "results")
    ).count()
    convs_expected = sorted(
        map(
            tuple,
            spark.read.parquet(
                os.path.join(out, "conversations", "results")
            ).drop("bucket").collect(),
        )
    )
    shutil.rmtree(os.path.join(out, "conversations"))

    assert (
        J.main(["--input", src, "--output", out, "--buckets", "8", "--resume"])
        == 0
    )
    assert "nothing to do" not in capsys.readouterr().out
    assert (
        spark.read.parquet(os.path.join(out, "turns", "results")).count()
        == spans_before
    )
    convs_after = sorted(
        map(
            tuple,
            spark.read.parquet(
                os.path.join(out, "conversations", "results")
            ).drop("bucket").collect(),
        )
    )
    assert convs_after == convs_expected

    # and now everything is complete: a further resume is a no-op
    assert (
        J.main(["--input", src, "--output", out, "--buckets", "8", "--resume"])
        == 0
    )
    assert "nothing to do: all buckets completed" in capsys.readouterr().out


def test_sft_export_snapshot_upsert_is_idempotent(spark, tmp_path):
    """--snapshot-table commits the rendered conversations; upsert mode
    MERGEs on conv_id so re-exporting the same input never duplicates
    rows at the table layer (even though the parquet sink appends)."""
    from gmft_spark.plans import snapshots as S

    import jobs.run_sft_export as J

    src = str(tmp_path / "in_s")
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    tbl = str(tmp_path / "tbl")
    _write_input(spark, src)
    base = ["--input", src, "--buckets", "4",
            "--snapshot-table", tbl, "--snapshot-mode", "upsert"]
    assert J.main(base + ["--output", out1, "--run-id", "s1"]) == 0
    n1 = S.read_table(spark, tbl).count()
    assert n1 > 0
    assert J.main(base + ["--output", out2, "--run-id", "s2"]) == 0
    t = S.read_table(spark, tbl)
    assert t.count() == n1  # MERGE, not duplicate
    assert set(r["run_id"] for r in t.select("run_id").distinct().collect()) == {
        "s2"
    }
    assert t.select("conv_id").distinct().count() == n1


def test_since_snapshot_reexports_whole_touched_conversations(spark, tmp_path):
    """A conversation that GAINS turns after the first export must
    re-render in full from a --since-snapshot incremental run — never as
    the delta fragment (which would export a truncated transcript with
    offsets restarting at 0 and, under upsert, silently replace the
    complete rendered row). Untouched conversations don't re-export."""
    from pyspark.sql import functions as F

    from gmft_spark.plans import snapshots as S

    import jobs.run_sft_export as J

    t = synthesize_transcripts(spark, n_convs=6, turns_per_conv=6)
    in_tbl = str(tmp_path / "in_tbl")
    # snapshot 1: every conversation's first 4 turns
    S.commit_append(spark, t.filter(F.col("turn_idx") < 4), in_tbl)
    out_tbl = str(tmp_path / "out_tbl")
    base = ["--input-snapshot-table", in_tbl, "--buckets", "4",
            "--snapshot-table", out_tbl, "--snapshot-mode", "upsert"]
    assert J.main(base + ["--output", str(tmp_path / "o1"),
                          "--run-id", "full"]) == 0
    first = {
        r["conv_id"]: (r["n_turns"], r["run_id"])
        for r in S.read_table(spark, out_tbl).collect()
    }
    grown = sorted(first)[0]
    # snapshot 2: ONE conversation gains its remaining 2 turns
    S.commit_append(
        spark,
        t.filter((F.col("conv_id") == grown) & (F.col("turn_idx") >= 4)),
        in_tbl,
    )
    assert J.main(base + ["--output", str(tmp_path / "o2"),
                          "--since-snapshot", "1", "--run-id", "inc"]) == 0
    after = {
        r["conv_id"]: (r["n_turns"], r["run_id"])
        for r in S.read_table(spark, out_tbl).collect()
    }
    # folding can merge tool turns, so compare against the FULL-input
    # render, not a raw turn count: the grown conversation's row must
    # equal a from-scratch export of all 6 turns
    assert after[grown][1] == "inc"
    assert after[grown][0] > first[grown][0]
    for cid in first:
        if cid != grown:
            assert after[cid] == first[cid]  # untouched: not re-exported
    # cross-check the rendered text equals a clean full export
    full_tbl = str(tmp_path / "full_tbl")
    S.commit_append(spark, t.filter(F.col("conv_id") == grown), full_tbl)
    ref_out = str(tmp_path / "ref_tbl")
    assert J.main(["--input-snapshot-table", full_tbl, "--buckets", "4",
                   "--snapshot-table", ref_out, "--output",
                   str(tmp_path / "o3"), "--run-id", "ref"]) == 0
    want = S.read_table(spark, ref_out).filter(
        F.col("conv_id") == grown
    ).collect()[0]["rendered"]
    got = S.read_table(spark, out_tbl).filter(
        F.col("conv_id") == grown
    ).collect()[0]["rendered"]
    assert got == want


def test_all_filtered_span_batch_never_reaches_the_lineage_writer(
    spark, tmp_path, capsys
):
    """render_spans_frame drops NULL-text rows: an input whose every turn
    is NULL text yields ZERO span rows even though the source frame is
    non-empty (folding would coalesce NULL to '', so --no-fold keeps the
    NULLs) — the job must skip the turns/ lineage write (an empty
    partitioned write crashes its own re-read) and still exit 0."""
    from pyspark.sql import functions as F

    import jobs.run_sft_export as J

    src = str(tmp_path / "in_null")
    synthesize_transcripts(spark, n_convs=3, turns_per_conv=3).withColumn(
        "text", F.lit(None).cast("string")
    ).write.parquet(src)
    out = str(tmp_path / "out_null")
    assert J.main(["--input", src, "--output", out, "--buckets", "4",
                   "--no-fold", "--run-id", "nulls"]) == 0
    assert not os.path.exists(os.path.join(out, "turns", "results"))

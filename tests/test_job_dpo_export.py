"""DPO export job entrypoint: pair mining from JSON-graded tool turns,
ungradeable payloads, zero-pair survival, lint gating, bucket resume."""

import os

from pyspark.sql import functions as F


def _graded_input(spark, path, fail_payload='{"tool":"search","ok":false}',
                  ok_payload='{"tool":"search","ok":true}', n_convs=6):
    """Six-turn conversations with an explicit failure→recovery episode:
    user(0), assistant(1), tool FAIL(2), assistant(3), tool OK(4),
    assistant(5) — each yields exactly one pair (prompt = user 0,
    rejected = assistant 1, chosen = assistant 3)."""
    roles = ["user", "assistant", "tool", "assistant", "tool", "assistant"]
    rows = []
    for c in range(n_convs):
        for k, role in enumerate(roles):
            text = (
                fail_payload
                if k == 2
                else ok_payload
                if k == 4
                else f"conv{c} turn{k} {role} says"
            )
            rows.append(
                (f"conv-{c}", k, role, text, None,
                 f"2026-01-01 00:00:{10 + k:02d}")
            )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(path)
    return df


def test_dpo_export_mines_failure_recovery_pairs(spark, tmp_path, capsys):
    import jobs.run_dpo_export as J

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _graded_input(spark, src)
    assert (
        J.main(["--input", src, "--output", out, "--buckets", "8",
                "--run-id", "d1"])
        == 0
    )
    pairs = spark.read.parquet(os.path.join(out, "pairs", "results"))
    rows = {r["conv_id"]: r for r in pairs.collect()}
    assert len(rows) == 6  # one pair per conversation
    src_df = spark.read.parquet(src)
    by_key = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in src_df.collect()
    }
    for conv_id, r in rows.items():
        assert r["failed_turn_idx"] == 2 and r["recovered_turn_idx"] == 4
        # role-anchored: assistant turn 1 rejected, assistant turn 3 chosen,
        # user turn 0 is the shared prompt (synthesize alternates u/a)
        assert r["rejected"] == by_key[(conv_id, 1)]
        assert r["chosen"] == by_key[(conv_id, 3)]
        assert r["prompt"] == by_key[(conv_id, 0)]
        assert r["split"] in ("train", "val", "test")

    # resume: all buckets with pairs completed -> clean no-op
    assert (
        J.main(["--input", src, "--output", out, "--buckets", "8", "--resume"])
        == 0
    )
    assert "nothing to do" in capsys.readouterr().out


def test_dpo_export_ungradeable_and_zero_pair_inputs(spark, tmp_path, capsys):
    import jobs.run_dpo_export as J

    # non-JSON tool payloads are ungradeable: no failures, no pairs,
    # and the job survives the empty output
    src1 = str(tmp_path / "in_u")
    _graded_input(
        spark, src1, fail_payload="oops not json", ok_payload="also not json"
    )
    out1 = str(tmp_path / "out_u")
    assert J.main(["--input", src1, "--output", out1, "--buckets", "4"]) == 0
    assert "0 preference pairs out" in capsys.readouterr().out
    assert not os.path.exists(os.path.join(out1, "pairs", "results"))

    # all tool calls succeed: graded but nothing to pair
    src2 = str(tmp_path / "in_ok")
    _graded_input(spark, src2, fail_payload='{"ok":true}')
    out2 = str(tmp_path / "out_ok")
    assert J.main(["--input", src2, "--output", out2, "--buckets", "4"]) == 0
    assert "0 preference pairs out" in capsys.readouterr().out


def test_dpo_export_lint_gate_drops_dirty_conversations(spark, tmp_path):
    import jobs.run_dpo_export as J

    clean_src = str(tmp_path / "in_clean")
    _graded_input(spark, clean_src)
    # poison conv-0 with a wall-clock inversion
    src = str(tmp_path / "in_l")
    ts = F.when(
        (F.col("conv_id") == "conv-0") & (F.col("turn_idx") == 3),
        F.lit("2020-01-01 00:00:00").cast("timestamp"),
    ).otherwise(F.col("ts"))
    spark.read.parquet(clean_src).withColumn("ts", ts).write.parquet(src)

    out1 = str(tmp_path / "gated")
    assert J.main(["--input", src, "--output", out1, "--buckets", "4"]) == 0
    gated = spark.read.parquet(os.path.join(out1, "pairs", "results"))
    assert gated.filter(F.col("conv_id") == "conv-0").count() == 0
    assert gated.count() == 5

    out2 = str(tmp_path / "kept")
    assert (
        J.main(["--input", src, "--output", out2, "--buckets", "4",
                "--keep-dirty"])
        == 0
    )
    kept = spark.read.parquet(os.path.join(out2, "pairs", "results"))
    assert kept.filter(F.col("conv_id") == "conv-0").count() == 1
    assert kept.count() == 6


def test_dpo_export_snapshot_upsert_is_idempotent(spark, tmp_path):
    from gmft_spark.plans import snapshots as S

    import jobs.run_dpo_export as J

    src = str(tmp_path / "in_s")
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    tbl = str(tmp_path / "tbl")
    _graded_input(spark, src)
    base = ["--input", src, "--buckets", "4",
            "--snapshot-table", tbl, "--snapshot-mode", "upsert"]
    assert J.main(base + ["--output", out1, "--run-id", "p1"]) == 0
    t1 = S.read_table(spark, tbl)
    assert t1.count() == 6 and "status" not in t1.columns
    assert J.main(base + ["--output", out2, "--run-id", "p2"]) == 0
    t2 = S.read_table(spark, tbl)
    assert t2.count() == 6
    assert set(r["run_id"] for r in t2.select("run_id").distinct().collect()) == {
        "p2"
    }

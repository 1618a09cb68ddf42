"""End-to-end incremental processing: the extraction job consuming a
snapshot table's changelog — batch 2 lands as snapshot 2, an incremental
run extracts ONLY those turns, and an empty delta is a clean no-op."""

import os

import pytest
from pyspark.sql import functions as F

from gmft_spark.plans import snapshots as S
from gmft_spark.sources.transcripts import transcripts_from_documents

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def snap_input(spark, tmp_path):
    """Transcripts split into two snapshot commits (by turn parity)."""
    table = str(tmp_path / "in_tbl")
    t = transcripts_from_documents(spark, SF_DIR)
    S.commit_append(spark, t.filter(F.col("turn_idx") % 2 == 0), table)
    S.commit_append(spark, t.filter(F.col("turn_idx") % 2 == 1), table)
    return table


def _run(args):
    import jobs.run_extraction as J

    return J.main(args)


def test_incremental_run_extracts_only_the_delta(spark, snap_input, tmp_path):
    out_full = str(tmp_path / "out_full")
    out_inc = str(tmp_path / "out_inc")
    assert (
        _run(
            ["--input-snapshot-table", snap_input, "--output", out_full,
             "--buckets", "8", "--run-id", "full"]
        )
        == 0
    )
    assert (
        _run(
            ["--input-snapshot-table", snap_input, "--since-snapshot", "1",
             "--output", out_inc, "--buckets", "8", "--run-id", "inc"]
        )
        == 0
    )
    full = spark.read.parquet(os.path.join(out_full, "results"))
    inc = spark.read.parquet(os.path.join(out_inc, "results"))
    # the delta is exactly the odd-turn half of the full run
    assert inc.filter(F.col("turn_idx") % 2 == 0).count() == 0
    assert inc.count() == full.filter(F.col("turn_idx") % 2 == 1).count()


def test_empty_delta_is_a_noop(snap_input, tmp_path, capsys):
    out = str(tmp_path / "out_noop")
    assert (
        _run(
            ["--input-snapshot-table", snap_input, "--since-snapshot", "2",
             "--output", out, "--buckets", "8"]
        )
        == 0
    )
    assert "no new input since snapshot 2" in capsys.readouterr().out
    assert not os.path.exists(os.path.join(out, "results"))


def test_upsert_mode_makes_reprocessing_idempotent(spark, snap_input, tmp_path):
    out_a = str(tmp_path / "out_a")
    out_b = str(tmp_path / "out_b")
    snap_out = str(tmp_path / "results_tbl")
    base = ["--input-snapshot-table", snap_input, "--buckets", "8",
            "--snapshot-table", snap_out, "--snapshot-mode", "upsert"]
    assert _run(base + ["--output", out_a, "--run-id", "r1"]) == 0
    n1 = S.read_table(spark, snap_out).count()
    # reprocess the SAME input: rows replace, not duplicate
    assert _run(base + ["--output", out_b, "--run-id", "r2"]) == 0
    t = S.read_table(spark, snap_out)
    assert t.count() == n1
    assert t.select("run_id").distinct().collect()[0]["run_id"] == "r2"
    assert (
        t.groupBy("conv_id", "turn_idx", "table_id").count()
        .filter(F.col("count") > 1).count() == 0
    )


def test_input_flags_are_exclusive(snap_input):
    with pytest.raises(SystemExit):
        _run(["--output", "/tmp/x"])
    with pytest.raises(SystemExit):
        _run(
            ["--input", "/tmp/a", "--input-snapshot-table", snap_input,
             "--output", "/tmp/x"]
        )


def test_extraction_job_maintains_a_stats_rollup(spark, tmp_path, snap_input):
    """--rollup-table: two incremental extraction runs keep the
    per-conversation table-row stats equal to a full recompute."""
    tbl = str(tmp_path / "res_tbl")
    roll = str(tmp_path / "res_roll")
    base = ["--buckets", "8", "--snapshot-table", tbl, "--rollup-table", roll]
    assert _run(
        ["--input-snapshot-table", snap_input, "--since-snapshot", "0",
         "--output", str(tmp_path / "o1"), "--run-id", "e1", *base]
    ) == 0
    assert _run(
        ["--input-snapshot-table", snap_input, "--since-snapshot", "1",
         "--output", str(tmp_path / "o2"), "--run-id", "e2", *base]
    ) == 0
    full = {
        r["conv_id"]: (r["n"], r["t"])
        for r in S.read_table(spark, tbl)
        .groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.sum("n_rows").alias("t"))
        .collect()
    }
    got = {
        r["conv_id"]: (r["n_rows"], r["sum_n_rows"])
        for r in S.read_table(spark, roll).collect()
    }
    assert got == full and len(got) > 0

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # rollup needs an append snapshot sink
        _run(["--input-snapshot-table", snap_input,
              "--output", str(tmp_path / "bad"), "--rollup-table", roll])

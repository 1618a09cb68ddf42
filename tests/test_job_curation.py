"""Curation job entrypoint: end-to-end run, dedup/quality effect,
bucket-resume no-op, snapshot commit."""

import os

from pyspark.sql import functions as F

from gmft_spark.operators.html_content import synthesize_html_transcripts
from gmft_spark.plans import snapshots as S


def test_curation_job_end_to_end(spark, tmp_path, capsys):
    import jobs.run_curation as J

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    tbl = str(tmp_path / "tbl")
    synthesize_html_transcripts(spark, n_convs=20, turns_per_conv=5).write.parquet(src)

    assert (
        J.main(
            ["--input", src, "--output", out, "--buckets", "8",
             "--min-quality", "0.1", "--snapshot-table", tbl,
             "--run-id", "t1"]
        )
        == 0
    )
    curated = spark.read.parquet(os.path.join(out, "results"))
    assert curated.count() > 0
    assert curated.filter(F.col("quality") < 0.1).count() == 0
    # fingerprint dedup kept one representative per fingerprint
    dup = curated.groupBy("fingerprint").count().filter(F.col("count") > 1)
    assert dup.count() == 0
    # snapshot committed and readable
    assert S.current_snapshot_id(tbl) == 1
    assert S.read_table(spark, tbl).count() == curated.count()

    # resume: all buckets complete -> clean no-op
    assert (
        J.main(["--input", src, "--output", out, "--buckets", "8", "--resume"])
        == 0
    )
    assert "nothing to do" in capsys.readouterr().out


def test_curation_upsert_mode_is_idempotent(spark, tmp_path):
    import jobs.run_curation as J

    src = str(tmp_path / "in_u")
    tbl = str(tmp_path / "tbl_u")
    synthesize_html_transcripts(spark, n_convs=10, turns_per_conv=4).write.parquet(src)
    base = ["--input", src, "--buckets", "8", "--min-quality", "0.1",
            "--snapshot-table", tbl, "--snapshot-mode", "upsert"]
    assert J.main(base + ["--output", str(tmp_path / "o1"), "--run-id", "c1"]) == 0
    n1 = S.read_table(spark, tbl).count()
    assert J.main(base + ["--output", str(tmp_path / "o2"), "--run-id", "c2"]) == 0
    t = S.read_table(spark, tbl)
    assert t.count() == n1  # replaced, not duplicated
    assert t.select("run_id").distinct().collect()[0]["run_id"] == "c2"


def test_curation_job_maintains_a_stats_rollup(spark, tmp_path):
    """--rollup-table: each run's corpus commit incrementally refreshes a
    per-conversation stats table that matches a full recompute."""
    import pytest

    import jobs.run_curation as J

    src = str(tmp_path / "in_r")
    tbl = str(tmp_path / "tbl_r")
    roll = str(tmp_path / "roll_r")
    synthesize_html_transcripts(spark, n_convs=8, turns_per_conv=3).write.parquet(src)
    base = ["--input", src, "--buckets", "8", "--min-quality", "0.1",
            "--snapshot-table", tbl, "--rollup-table", roll]
    assert J.main(base + ["--output", str(tmp_path / "r1"), "--run-id", "r1"]) == 0
    # second batch of fresh conversations appends and refreshes again
    synthesize_html_transcripts(spark, n_convs=12, turns_per_conv=3).filter(
        F.col("conv_id") > "hconv-7"
    ).write.parquet(src + "_b2")
    assert J.main(
        ["--input", src + "_b2", "--buckets", "8", "--min-quality", "0.1",
         "--snapshot-table", tbl, "--rollup-table", roll,
         "--output", str(tmp_path / "r2"), "--run-id", "r2"]
    ) == 0
    full = {
        r["conv_id"]: (r["n"], r["t"])
        for r in S.read_table(spark, tbl)
        .groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    got = {
        r["conv_id"]: (r["n_rows"], r["sum_n_tokens"])
        for r in S.read_table(spark, roll).collect()
    }
    assert got == full and len(got) >= 9

    # rollup without an append-mode snapshot commit is a usage error
    with pytest.raises(SystemExit):
        J.main(["--input", src, "--output", str(tmp_path / "bad"),
                "--rollup-table", roll])


def test_curation_job_buckets_the_corpus_table(spark, tmp_path):
    import jobs.run_curation as J

    src = str(tmp_path / "in_b")
    tbl = str(tmp_path / "tbl_b")
    synthesize_html_transcripts(spark, n_convs=24, turns_per_conv=3).write.parquet(src)
    assert J.main(
        ["--input", src, "--output", str(tmp_path / "ob"), "--buckets", "8",
         "--min-quality", "0.1", "--snapshot-table", tbl,
         "--snapshot-buckets", "4", "--run-id", "b1"]
    ) == 0
    snap = S.load_snapshot(tbl, 1)
    assert snap["partition_spec"] == ["conv_id", 4]
    hit = S.plan_files(tbl, point={"conv_id": "hconv-11"})
    assert 0 < len(hit) < len(snap["files"])
    assert S.read_table(spark, tbl, point={"conv_id": "hconv-11"}).filter(
        "conv_id = 'hconv-11'"
    ).count() == 3

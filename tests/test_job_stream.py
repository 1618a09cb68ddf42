"""Streaming job entrypoint: drain → snapshot commits, checkpoint
resume skips processed files, rollup tracks the table."""

from pyspark.sql import functions as F

from gmft_spark.plans import snapshots as S
from gmft_spark.sources.transcripts import synthesize_transcripts


def test_stream_job_drains_resumes_and_rolls_up(spark, tmp_path, capsys):
    import jobs.run_stream as J

    src = str(tmp_path / "in")
    tbl = str(tmp_path / "tbl")
    roll = str(tmp_path / "roll")
    ckpt = str(tmp_path / "ckpt")
    args = ["--input", src, "--snapshot-table", tbl,
            "--checkpoint", ckpt, "--rollup-table", roll]

    synthesize_transcripts(spark, n_convs=6, turns_per_conv=5).write.parquet(src)
    assert J.main(args) == 0
    n1 = S.read_table(spark, tbl).count()
    assert n1 > 0 and "snapshot head" in capsys.readouterr().out

    # resume: nothing new -> no extra snapshot, same rows
    head = S.current_snapshot_id(tbl)
    assert J.main(args) == 0
    assert S.current_snapshot_id(tbl) == head
    assert S.read_table(spark, tbl).count() == n1

    # new file appears -> a further drain commits only its rows
    synthesize_transcripts(spark, n_convs=8, turns_per_conv=5).filter(
        F.col("conv_id").isin("conv-6", "conv-7")
    ).write.mode("append").parquet(src)
    assert J.main(args) == 0
    t = S.read_table(spark, tbl)
    assert t.count() > n1
    got = {
        r["conv_id"]: r["n_rows"]
        for r in S.read_table(spark, roll).collect()
    }
    full = {
        r["conv_id"]: r["n"]
        for r in t.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == full and len(got) == 8

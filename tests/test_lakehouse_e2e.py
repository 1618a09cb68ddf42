"""Capstone composition test: the production story end-to-end through
the job entrypoints — two curation runs commit a bucketed corpus table
and keep its rollup fresh, the changelog view isolates the second
batch, and one maintenance run purges a conversation, compacts, and
expires history — every layer observed through its public surface."""

from pyspark.sql import functions as F

from gmft_spark.operators.html_content import synthesize_html_transcripts
from gmft_spark.plans import snapshots as S


def test_jobs_and_table_layer_compose(spark, tmp_path):
    import jobs.run_curation as C
    import jobs.run_table_maintenance as M

    tbl = str(tmp_path / "corpus")
    roll = str(tmp_path / "stats")
    b1 = str(tmp_path / "b1")
    b2 = str(tmp_path / "b2")
    synthesize_html_transcripts(spark, n_convs=16, turns_per_conv=3).write.parquet(b1)
    synthesize_html_transcripts(spark, n_convs=24, turns_per_conv=3).filter(
        F.col("conv_id").isin([f"hconv-{i}" for i in range(16, 24)])
    ).write.parquet(b2)

    base = ["--buckets", "8", "--min-quality", "0.1",
            "--snapshot-table", tbl, "--snapshot-buckets", "4",
            "--rollup-table", roll]
    assert C.main(["--input", b1, "--output", str(tmp_path / "o1"),
                   "--run-id", "c1", *base]) == 0
    assert C.main(["--input", b2, "--output", str(tmp_path / "o2"),
                   "--run-id", "c2", *base]) == 0

    # changelog view isolates batch 2 exactly
    diff = S.table_diff(spark, tbl, from_snapshot_id=1)
    assert diff.filter("_change_type = 'delete'").count() == 0
    n_b2 = diff.count()
    assert n_b2 == S.read_table(spark, tbl).filter("run_id = 'c2'").count() > 0

    # bucket point lookup: fewer files, complete rows
    hit = S.plan_files(tbl, point={"conv_id": "hconv-20"})
    assert 0 < len(hit) < len(S.plan_files(tbl))
    assert S.read_table(spark, tbl, point={"conv_id": "hconv-20"}).filter(
        "conv_id = 'hconv-20'"
    ).count() == 3

    # rollup tracked both commits
    state = {
        r["conv_id"]: r["n_rows"]
        for r in S.read_table(spark, roll).collect()
    }
    full = {
        r["conv_id"]: r["n"]
        for r in S.read_table(spark, tbl)
        .groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    assert state == full and len(state) == 24

    # one maintenance run: GDPR purge + compact + trim history
    assert M.main(["--table", tbl,
                   "--delete", "conv_id = 'hconv-3'",
                   "--compact", "1",
                   "--expire-keep", "2"]) == 0
    t = S.read_table(spark, tbl)
    assert t.filter("conv_id = 'hconv-3'").count() == 0
    assert t.count() == sum(full.values()) - full["hconv-3"]
    assert len(S.snapshots(tbl)) == 2  # only delete + compact retained

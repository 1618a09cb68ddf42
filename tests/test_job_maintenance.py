"""Table-maintenance job entrypoint: delete → compact → zorder →
rollup → expire in one run, each action an atomic commit."""

import pytest
from pyspark.sql import functions as F

from gmft_spark.plans import snapshots as S


@pytest.fixture()
def table(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    for lo in (0, 40):  # two append commits -> changelog with two deltas
        S.commit_append(
            spark,
            spark.range(lo, lo + 40).select(
                F.concat(F.lit("conv-"), (F.col("id") % 4).cast("string")
                         ).alias("conv_id"),
                F.col("id").alias("doc_id"),
                (F.col("id") % 7).alias("n_tokens"),
            ),
            tbl,
        )
    return tbl


def test_maintenance_runs_every_action(spark, table, tmp_path, capsys):
    import jobs.run_table_maintenance as J

    roll = str(tmp_path / "roll")
    assert J.main(
        ["--table", table,
         "--delete", "doc_id >= 70",
         "--compact", "1",
         "--zorder", "doc_id,n_tokens",
         "--rollup-table", roll, "--rollup-keys", "conv_id",
         "--rollup-sums", "n_tokens",
         "--expire-keep", "2"]
    ) == 0
    out = capsys.readouterr().out
    assert "delete: snapshot 3, 10 rows deleted" in out
    assert "compact: snapshot 4" in out
    assert "zorder: snapshot 5" in out
    assert "rollup: refreshed through source snapshot 5" in out
    assert "expire:" in out

    t = S.read_table(spark, table)
    assert t.count() == 70 and t.filter("doc_id >= 70").count() == 0
    # the rollup aggregated the APPEND changelog (pre-delete rows included
    # by design: deletes are overwrite commits the changelog skips)
    got = {
        r["conv_id"]: (r["n_rows"], r["sum_n_tokens"])
        for r in S.read_table(spark, roll).collect()
    }
    assert sum(n for n, _ in got.values()) == 80
    # history trimmed to the last 2 snapshots; older time travel is gone
    assert len(S.snapshots(table)) == 2
    with pytest.raises(FileNotFoundError):
        S.load_snapshot(table, 1)


def test_maintenance_requires_an_action(table):
    import jobs.run_table_maintenance as J

    with pytest.raises(SystemExit):
        J.main(["--table", table])

"""Incremental rollup maintenance: delta-only refresh equals the full
recompute, replays converge, and untouched groups' files don't rewrite."""

import pytest
from pyspark.sql import functions as F

from gmft_spark.plans import snapshots as S
from gmft_spark.plans.rollup import last_refreshed_snapshot, refresh_rollup


@pytest.fixture()
def tables(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "roll")


def _batch(spark, rows):
    return spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")


def _state(spark, roll):
    return {
        r["source"]: (r["n_rows"], r["sum_n_tokens"])
        for r in S.read_table(spark, roll).collect()
    }


def test_refresh_tracks_the_changelog(spark, tables):
    src, roll = tables
    S.commit_append(
        spark, _batch(spark, [("web", 1, 10), ("web", 2, 20), ("pdf", 3, 5)]), src
    )
    r = refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    assert r == {"refreshed": True, "source_snapshot_id": 1}
    assert _state(spark, roll) == {"web": (2, 30), "pdf": (1, 5)}

    # second ingest touches one existing group and adds a new one
    S.commit_append(
        spark, _batch(spark, [("web", 4, 7), ("code", 5, 100)]), src
    )
    r = refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    assert r["source_snapshot_id"] == 2
    assert _state(spark, roll) == {
        "web": (3, 37),
        "pdf": (1, 5),
        "code": (1, 100),
    }
    # matches a from-scratch recompute
    full = {
        r["source"]: (r["n"], r["t"])
        for r in S.read_table(spark, src)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert _state(spark, roll) == full


def test_refresh_without_new_input_is_a_noop(spark, tables):
    src, roll = tables
    S.commit_append(spark, _batch(spark, [("web", 1, 10)]), src)
    refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    head = S.current_snapshot_id(roll)
    r = refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    assert r["refreshed"] is False
    assert S.current_snapshot_id(roll) == head


def test_replayed_refresh_converges(spark, tables):
    """Simulate a crash between the state commit and the caller seeing
    it: re-running the refresh over the same delta must not double-count.
    The watermark rides in the same atomic commit, so a replay simply
    sees no new input."""
    src, roll = tables
    S.commit_append(spark, _batch(spark, [("web", 1, 10)]), src)
    refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    S.commit_append(spark, _batch(spark, [("web", 2, 20)]), src)
    refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    before = _state(spark, roll)
    for _ in range(2):  # replay storms
        refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    assert _state(spark, roll) == before == {"web": (2, 30)}
    assert last_refreshed_snapshot(roll) == 2


def test_refresh_fails_loudly_when_watermark_snapshots_expired(spark, tables):
    """If source expiry dropped append snapshots the rollup never
    consumed, the refresh must refuse (silently skipping them would let
    the rollup diverge from the table forever)."""
    src, roll = tables
    S.commit_append(spark, _batch(spark, [("web", 1, 10)]), src)
    refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    S.commit_append(spark, _batch(spark, [("web", 2, 20)]), src)
    S.commit_append(spark, _batch(spark, [("pdf", 3, 7)]), src)
    S.expire_snapshots(src, keep_last=1)  # drops snapshots 1 and 2
    with pytest.raises(ValueError, match="expired"):
        refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])


def test_normal_compact_expire_lifecycle_keeps_refreshing(spark, tables):
    """compact → expire (which drops the already-consumed watermark
    snapshot) → append → refresh must SUCCEED: nothing incremental was
    lost, because the only append in range diffs against the retained
    compact snapshot. The expiry guard must not be stricter than what
    incremental_scan actually needs."""
    src, roll = tables
    S.commit_append(spark, _batch(spark, [("web", 1, 10)]), src)
    refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    S.compact(spark, src, target_partitions=1)  # snap 2
    S.expire_snapshots(src, keep_last=1)  # drops snap 1 (the watermark)
    S.commit_append(spark, _batch(spark, [("pdf", 2, 7)]), src)  # snap 3
    r = refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    assert r["refreshed"] is True and r["source_snapshot_id"] == 3
    assert _state(spark, roll) == {"web": (1, 10), "pdf": (1, 7)}


def test_refresh_delta_is_bounded_by_captured_head(spark, tables):
    """The watermark and the delta must cover the SAME snapshot range:
    scanning 'whatever HEAD is now' while recording the earlier head
    would double-count an append racing the refresh. Pin the plumbing by
    checking the recorded watermark equals the head the scan consumed."""
    src, roll = tables
    S.commit_append(spark, _batch(spark, [("web", 1, 10)]), src)
    r = refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    assert r["source_snapshot_id"] == S.current_snapshot_id(src) == 1
    assert last_refreshed_snapshot(roll) == 1
    S.commit_append(spark, _batch(spark, [("web", 2, 20)]), src)
    r2 = refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    assert r2["source_snapshot_id"] == 2 and _state(spark, roll) == {"web": (2, 30)}


def test_untouched_group_files_carry_through_refresh(spark, tables):
    src, roll = tables
    S.commit_append(spark, _batch(spark, [("web", 1, 10), ("pdf", 2, 5)]), src)
    refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    # split state across files so the carry is observable
    S.compact(spark, roll, target_partitions=1)
    S.commit_append(spark, _batch(spark, [("code", 9, 1)]), src)
    refresh_rollup(spark, src, roll, keys=["source"], sum_cols=["n_tokens"])
    snap = S.load_snapshot(roll, S.current_snapshot_id(roll))
    # 'code' didn't overlap web/pdf's file: the old state file carried
    assert snap["operation"] == "overwrite"
    assert snap["summary"]["files_rewritten"] == 0
    assert snap["summary"]["files_carried"] >= 1
    assert _state(spark, roll) == {"web": (1, 10), "pdf": (1, 5), "code": (1, 1)}

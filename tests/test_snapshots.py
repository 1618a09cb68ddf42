"""Snapshot-layer guarantees: atomic visibility, time travel, incremental
scans, optimistic-concurrency conflicts, rollback, expiry+vacuum."""

import os

import pytest

from gmft_spark.plans import snapshots as S


def _batch(spark, ids):
    return spark.createDataFrame(
        [(i, f"doc-{i}") for i in ids], "doc_id long, text string"
    )


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_append_time_travel_and_incremental(spark, table):
    s1 = S.commit_append(spark, _batch(spark, [1, 2]), table)
    s2 = S.commit_append(spark, _batch(spark, [3]), table)
    s3 = S.commit_append(spark, _batch(spark, [4, 5]), table)
    assert (s1, s2, s3) == (1, 2, 3)
    assert S.current_snapshot_id(table) == 3

    assert _ids(S.read_table(spark, table)) == [1, 2, 3, 4, 5]
    assert _ids(S.read_table(spark, table, snapshot_id=1)) == [1, 2]
    assert _ids(S.read_table(spark, table, snapshot_id=2)) == [1, 2, 3]

    assert _ids(S.incremental_scan(spark, table, since_snapshot_id=1)) == [3, 4, 5]
    assert _ids(
        S.incremental_scan(spark, table, since_snapshot_id=1, until_snapshot_id=2)
    ) == [3]
    assert S.incremental_scan(spark, table, since_snapshot_id=3) is None

    summaries = [s["summary"]["added_rows"] for s in S.snapshots(table)]
    assert summaries == [2, 1, 2]


def test_commit_conflict_raises_and_preserves_state(spark, table):
    S.commit_append(spark, _batch(spark, [1]), table)
    # a competing writer that built on the SAME parent publishes first
    stale = {
        "snapshot_id": 2,
        "parent_id": 1,
        "operation": "append",
        "files": S.load_snapshot(table, 1)["files"],
        "summary": {},
    }
    S._publish(table, dict(stale, snapshot_id=2), expected_parent=1)
    with pytest.raises(S.CommitConflict):
        S._publish(table, dict(stale, snapshot_id=2), expected_parent=1)
    assert S.current_snapshot_id(table) == 2
    # the loser retries on fresh state and succeeds
    sid = S.commit_append(spark, _batch(spark, [9]), table)
    assert sid == 3
    assert _ids(S.read_table(spark, table)) == [1, 9]


def test_rollback_is_append_only(spark, table):
    S.commit_append(spark, _batch(spark, [1, 2]), table)
    S.commit_append(spark, _batch(spark, [3]), table)
    sid = S.rollback(table, to_snapshot_id=1)
    assert sid == 3
    assert _ids(S.read_table(spark, table)) == [1, 2]
    # history intact: the rolled-back-over snapshot still time-travels
    assert _ids(S.read_table(spark, table, snapshot_id=2)) == [1, 2, 3]
    # appends continue from the rollback state
    S.commit_append(spark, _batch(spark, [7]), table)
    assert _ids(S.read_table(spark, table)) == [1, 2, 7]


def test_expire_vacuums_unreferenced_files(spark, table):
    S.commit_append(spark, _batch(spark, [1]), table)
    S.commit_append(spark, _batch(spark, [2]), table)
    S.rollback(table, to_snapshot_id=1)  # snap 2's file now unreferenced
    stats = S.expire_snapshots(table, keep_last=1)
    assert stats["expired_snapshots"] == 2
    assert stats["deleted_files"] >= 1
    assert _ids(S.read_table(spark, table)) == [1]
    with pytest.raises(FileNotFoundError):
        S.load_snapshot(table, 2)
    # no orphan parquet anywhere on disk
    live = set(S.load_snapshot(table, S.current_snapshot_id(table))["files"])
    on_disk = {
        os.path.relpath(os.path.join(root, f), table)
        for root, _, fs in os.walk(os.path.join(table, "data"))
        for f in fs
        if f.endswith(".parquet")
    }
    assert on_disk == live


def test_compaction_preserves_rows_and_changelog_semantics(spark, table):
    S.commit_append(spark, _batch(spark, [1, 2]), table)
    S.commit_append(spark, _batch(spark, [3]), table)
    sid = S.compact(spark, table, target_partitions=1)
    assert sid == 3
    assert S.load_snapshot(table, 3)["operation"] == "compact"
    # rows identical; file count down to 1
    assert _ids(S.read_table(spark, table)) == [1, 2, 3]
    assert len(S.load_snapshot(table, 3)["files"]) == 1
    # time travel to pre-compaction still works
    assert _ids(S.read_table(spark, table, snapshot_id=1)) == [1, 2]
    # incremental consumers never re-see compacted rows...
    assert S.incremental_scan(spark, table, since_snapshot_id=2) is None
    # ...but still see genuine appends across the compaction
    S.commit_append(spark, _batch(spark, [9]), table)
    assert _ids(S.incremental_scan(spark, table, since_snapshot_id=2)) == [9]
    assert _ids(S.incremental_scan(spark, table, since_snapshot_id=1)) == [3, 9]
    # expiry vacuums the pre-compaction small files, reads stay intact
    S.expire_snapshots(table, keep_last=2)
    assert _ids(S.read_table(spark, table)) == [1, 2, 3, 9]


def test_upsert_rewrites_only_matched_files(spark, table):
    # one data file per commit so file-granularity assertions are exact
    S.commit_append(spark, _batch(spark, [1, 2]).coalesce(1), table)
    S.commit_append(spark, _batch(spark, [3]).coalesce(1), table)
    file_a = set(S.load_snapshot(table, 1)["files"])
    file_b = set(S.load_snapshot(table, 2)["files"]) - file_a
    assert len(file_a) == len(file_b) == 1
    batch = spark.createDataFrame(
        [(2, "doc-2-v2"), (9, "doc-9")], "doc_id long, text string"
    )
    sid = S.commit_upsert(spark, batch, table, key_cols=["doc_id"])
    assert sid == 3
    snap = S.load_snapshot(table, 3)
    assert snap["operation"] == "overwrite"
    # key 2 lives in file_a → rewritten; file_b (key 3 only) carries over
    assert file_a.isdisjoint(snap["files"])
    assert file_b <= set(snap["files"])
    assert snap["summary"]["files_rewritten"] == 1
    assert snap["summary"]["files_carried"] == 1

    rows = {r["doc_id"]: r["text"] for r in S.read_table(spark, table).collect()}
    assert rows == {1: "doc-1", 2: "doc-2-v2", 3: "doc-3", 9: "doc-9"}
    # time travel to the pre-merge state is intact
    assert _ids(S.read_table(spark, table, snapshot_id=2)) == [1, 2, 3]
    # changelog consumers skip the replace commit entirely...
    assert S.incremental_scan(spark, table, since_snapshot_id=2) is None
    # ...but still see appends that follow it
    S.commit_append(spark, _batch(spark, [7]), table)
    assert _ids(S.incremental_scan(spark, table, since_snapshot_id=2)) == [7]


def test_upsert_on_empty_table_is_an_append(spark, table):
    batch = _batch(spark, [1, 2])
    sid = S.commit_upsert(spark, batch, table, key_cols=["doc_id"])
    assert sid == 1
    assert S.load_snapshot(table, 1)["operation"] == "append"
    assert _ids(S.read_table(spark, table)) == [1, 2]


def test_upsert_with_no_matches_carries_every_file(spark, table):
    S.commit_append(spark, _batch(spark, [1, 2]), table)
    sid = S.commit_upsert(spark, _batch(spark, [9]), table, key_cols=["doc_id"])
    snap = S.load_snapshot(table, sid)
    assert snap["summary"]["files_rewritten"] == 0
    assert set(S.load_snapshot(table, 1)["files"]) <= set(snap["files"])
    assert _ids(S.read_table(spark, table)) == [1, 2, 9]


def test_file_skipping_prunes_by_manifest_stats(spark, table):
    # three sorted single-file batches: id ranges [1,3], [10,12], [20,22]
    for lo in (1, 10, 20):
        S.commit_append(
            spark,
            _batch(spark, [lo, lo + 1, lo + 2]).coalesce(1),
            table,
            stat_cols=["doc_id"],  # inherited by later commits
        )
    snap = S.load_snapshot(table, 3)
    assert snap["stat_cols"] == ["doc_id"]
    assert all(snap["stats"][p].get("doc_id") for p in snap["files"])

    assert len(S.plan_files(table)) == 3
    assert len(S.plan_files(table, {"doc_id": (10, 12)})) == 1
    assert len(S.plan_files(table, {"doc_id": (3, 10)})) == 2  # spans two
    assert len(S.plan_files(table, {"doc_id": (None, 5)})) == 1
    assert len(S.plan_files(table, {"doc_id": (100, None)})) == 0

    # pruned read + real filter == full-scan filter
    import pyspark.sql.functions as F

    pruned = S.read_table(spark, table, prune={"doc_id": (10, 12)})
    want = _ids(S.read_table(spark, table).filter(F.col("doc_id") >= 10)
                .filter(F.col("doc_id") <= 12))
    assert _ids(pruned.filter(F.col("doc_id").between(10, 12))) == want
    # pruned-to-nothing: empty frame, schema intact
    empty = S.read_table(spark, table, prune={"doc_id": (100, 200)})
    assert empty.count() == 0 and empty.columns == ["doc_id", "text"]


def test_file_skipping_keeps_statless_files(spark, table):
    S.commit_append(spark, _batch(spark, [1]).coalesce(1), table)  # no stats
    S.commit_append(
        spark, _batch(spark, [50]).coalesce(1), table, stat_cols=["doc_id"]
    )
    # the stat-less file survives any prune; the stated one is skippable
    assert len(S.plan_files(table, {"doc_id": (40, 60)})) == 2
    assert len(S.plan_files(table, {"doc_id": (90, 99)})) == 1
    assert _ids(S.read_table(spark, table, prune={"doc_id": (90, 99)})) == [1]


def test_file_skipping_survives_upsert_and_compact(spark, table):
    S.commit_append(
        spark, _batch(spark, [1, 2]).coalesce(1), table, stat_cols=["doc_id"]
    )
    S.commit_append(spark, _batch(spark, [10, 11]).coalesce(1), table)
    S.commit_upsert(
        spark, _batch(spark, [2]).coalesce(1), table, key_cols=["doc_id"]
    )
    snap = S.load_snapshot(table, S.current_snapshot_id(table))
    assert snap["stat_cols"] == ["doc_id"]  # inherited through the merge
    assert all("doc_id" in snap["stats"][p] for p in snap["files"])
    # the untouched [10,11] file is still individually skippable
    assert len(S.plan_files(table, {"doc_id": (10, 11)})) == 1
    sid = S.compact(spark, table, target_partitions=1)
    snap = S.load_snapshot(table, sid)
    assert len(snap["files"]) == 1 and "doc_id" in snap["stats"][snap["files"][0]]


def test_additive_schema_evolution(spark, table):
    S.commit_append(spark, _batch(spark, [1, 2]), table)
    evolved = spark.createDataFrame(
        [(3, "doc-3", "en")], "doc_id long, text string, lang string"
    )
    S.commit_append(spark, evolved, table)
    t = S.read_table(spark, table, merge_schema=True)
    assert set(t.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r["lang"] for r in t.collect()}
    assert rows == {1: None, 2: None, 3: "en"}  # old files: new col null


def test_zorder_cluster_skips_files_on_every_clustered_column(spark, table):
    import pyspark.sql.functions as F

    grid = spark.createDataFrame(
        [(x, y, x * 32 + y) for x in range(32) for y in range(32)],
        "x int, y int, payload long",
    )
    # 4 unclustered ingest files: each spans the FULL x and y ranges
    for m in range(4):
        S.commit_append(
            spark,
            grid.filter(F.col("payload") % 4 == m).coalesce(1),
            table,
            stat_cols=["x"],
        )
    assert len(S.plan_files(table, {"x": (0, 3)})) == 4  # nothing skippable

    sid = S.cluster_by(spark, table, ["x", "y"], target_files=16)
    snap = S.load_snapshot(table, sid)
    assert snap["operation"] == "cluster"
    assert snap["stat_cols"] == ["x", "y"]  # cluster cols joined the stats
    assert len(snap["files"]) == 16

    # a quarter-domain range on EITHER dimension reads ≤ 1/4 of the files
    for col in ("x", "y"):
        kept = S.plan_files(table, {col: (0, 7)})
        assert len(kept) <= 4, f"{col}: kept {len(kept)}"
        got = (
            S.read_table(spark, table, prune={col: (0, 7)})
            .filter(F.col(col) <= 7)
            .count()
        )
        assert got == 8 * 32  # pruning lost nothing
    # rows preserved; rewrite invisible to changelog consumers
    assert S.read_table(spark, table).count() == 1024
    assert S.incremental_scan(spark, table, since_snapshot_id=4) is None
    # time travel to the unclustered layout
    assert S.read_table(spark, table, snapshot_id=4).count() == 1024


def test_crash_orphan_commit_is_invisible_then_vacuumed(spark, table):
    S.commit_append(spark, _batch(spark, [1]), table)
    # simulate a writer that crashed after landing data, before publishing
    orphan_dir = os.path.join(table, "data", "deadbeef")
    _batch(spark, [99]).write.parquet(orphan_dir)
    assert _ids(S.read_table(spark, table)) == [1]  # never visible
    stats = S.expire_snapshots(table, keep_last=1)
    assert stats["deleted_files"] >= 1
    assert not os.path.exists(orphan_dir)
    assert _ids(S.read_table(spark, table)) == [1]


def test_delete_rewrites_only_matching_files(spark, table):
    S.commit_append(spark, _batch(spark, [1, 2]).coalesce(1), table)
    S.commit_append(spark, _batch(spark, [3, 4]).coalesce(1), table)
    sid = S.commit_delete(spark, table, "doc_id = 3")
    assert sid == 3
    assert _ids(S.read_table(spark, table)) == [1, 2, 4]
    snap = S.load_snapshot(table, sid)
    assert snap["operation"] == "delete"
    assert snap["summary"]["rows_deleted"] == 1
    assert snap["summary"]["files_rewritten"] == 1
    assert snap["summary"]["files_carried"] == 1  # [1,2]'s file untouched
    # time travel still sees the pre-delete state
    assert _ids(S.read_table(spark, table, snapshot_id=2)) == [1, 2, 3, 4]
    # changelog consumers skip the delete commit (non-append)
    assert S.incremental_scan(spark, table, since_snapshot_id=2) is None


def test_delete_with_no_matches_is_a_noop(spark, table):
    S.commit_append(spark, _batch(spark, [1, 2]), table)
    assert S.commit_delete(spark, table, "doc_id > 99") == 1
    assert S.current_snapshot_id(table) == 1
    assert _ids(S.read_table(spark, table)) == [1, 2]


def test_delete_null_predicate_rows_survive(spark, table):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "doc_id long, text string"
    )
    S.commit_append(spark, df, table)
    S.commit_delete(spark, table, "text = 'a'")  # NULL = 'a' is NULL, not TRUE
    assert _ids(S.read_table(spark, table)) == [2, 3]


def test_delete_prunes_candidates_by_manifest_stats(spark, table):
    S.commit_append(
        spark, _batch(spark, [1, 2]).coalesce(1), table, stat_cols=["doc_id"]
    )
    S.commit_append(spark, _batch(spark, [50, 51]).coalesce(1), table)
    sid = S.commit_delete(
        spark, table, "doc_id >= 50", prune={"doc_id": (50, None)}
    )
    snap = S.load_snapshot(table, sid)
    # the [1,2] file was never a candidate: carried, not rewritten
    assert snap["summary"] == {
        **snap["summary"],
        "files_rewritten": 1,
        "files_carried": 1,
        "rows_deleted": 2,
    }
    assert _ids(S.read_table(spark, table)) == [1, 2]


def _changes(df):
    return sorted((r["doc_id"], r["_change_type"]) for r in df.collect())


def test_table_diff_sees_through_upsert_and_delete(spark, table):
    S.commit_append(spark, _batch(spark, [1, 2]).coalesce(1), table)
    S.commit_append(spark, _batch(spark, [3]).coalesce(1), table)
    S.commit_upsert(
        spark,
        spark.createDataFrame([(2, "doc-2-v2"), (4, "doc-4")],
                              "doc_id long, text string"),
        table, key_cols=["doc_id"],
    )
    S.commit_delete(spark, table, "doc_id = 1")
    diff = S.table_diff(spark, table, from_snapshot_id=2)
    # vs snapshot 2 {1,2,3}: 2 rewrote (delete+insert), 4 inserted, 1 deleted
    assert _changes(diff) == [
        (1, "delete"), (2, "delete"), (2, "insert"), (4, "insert"),
    ]
    # bounded window: the upsert alone
    assert _changes(S.table_diff(spark, table, 2, 3)) == [
        (2, "delete"), (2, "insert"), (4, "insert"),
    ]


def test_table_diff_across_schema_evolution_boundary(spark, table):
    """A diff whose sides straddle an additive-evolution commit must
    null-fill the missing columns and still cancel unchanged rows, not
    throw or mis-cancel (the changelog view and schema evolution have to
    compose)."""
    S.commit_append(spark, _batch(spark, [1, 2]), table)
    evolved = spark.createDataFrame(
        [(3, "doc-3", "en")], "doc_id long, text string, lang string"
    )
    S.commit_append(spark, evolved, table)
    diff = S.table_diff(spark, table, from_snapshot_id=1)
    rows = [(r["doc_id"], r["lang"], r["_change_type"]) for r in diff.collect()]
    assert rows == [(3, "en", "insert")]
    # compaction across the boundary rewrites every file through the
    # merged schema; old rows (null-filled lang) must still cancel
    S.compact(spark, table, target_partitions=1)
    d2 = S.table_diff(spark, table, from_snapshot_id=2)
    assert d2.count() == 0


def test_upsert_and_delete_on_percent_encodable_table_path(spark, tmp_path):
    """input_file_name() returns percent-ENCODED URIs; a table path with
    a space/% must still match file identities — otherwise upsert carries
    the old file AND appends (duplicate keys) and delete silently no-ops."""
    table = str(tmp_path / "snap tbl %x")
    S.commit_append(spark, _batch(spark, [1, 2]).coalesce(1), table)
    S.commit_upsert(
        spark,
        spark.createDataFrame([(2, "doc-2-v2")], "doc_id long, text string"),
        table,
        key_cols=["doc_id"],
    )
    rows = {r["doc_id"]: r["text"] for r in S.read_table(spark, table).collect()}
    assert rows == {1: "doc-1", 2: "doc-2-v2"}  # no duplicate key 2
    assert S.load_snapshot(table, 2)["summary"]["files_rewritten"] == 1
    sid = S.commit_delete(spark, table, "doc_id = 1")
    assert sid == 3  # matched: a real delete commit, not a silent no-op
    assert _ids(S.read_table(spark, table)) == [2]


def test_table_diff_same_snapshot_is_empty(spark, table):
    S.commit_append(spark, _batch(spark, [1]), table)
    assert S.table_diff(spark, table, 1, 1).count() == 0


def test_table_diff_cancels_compaction_rewrites(spark, table):
    """A compact rewrites every file, but the rows are identical — the
    bag difference must be empty even though no file is shared."""
    S.commit_append(spark, _batch(spark, [1, 2]), table)
    S.commit_append(spark, _batch(spark, [3]), table)
    S.compact(spark, table, target_partitions=1)
    assert S.table_diff(spark, table, from_snapshot_id=2).count() == 0


def test_zorder_clusters_string_columns_by_prefix(spark, table):
    """Z-ordering on a STRING column uses an order-preserving 4-byte
    prefix key, so file bounds segregate by prefix and a string-range
    prune skips files."""
    from pyspark.sql import functions as F

    df = spark.range(0, 64).select(
        F.concat(
            F.element_at(
                F.array(F.lit("alpha-"), F.lit("mid-"), F.lit("zeta-")),
                (F.col("id") % 3 + 1).cast("int"),
            ),
            F.col("id").cast("string"),
        ).alias("conv_id"),
        F.col("id").alias("doc_id"),
    )
    S.commit_append(spark, df, table)
    sid = S.cluster_by(spark, table, ["conv_id", "doc_id"], target_files=4)
    snap = S.load_snapshot(table, sid)
    assert snap["operation"] == "cluster"
    pruned = S.plan_files(table, prune={"conv_id": ("zeta-", None)})
    assert 0 < len(pruned) < len(snap["files"])
    got = S.read_table(
        spark, table, prune={"conv_id": ("zeta-", None)}
    ).filter(F.col("conv_id") >= "zeta-")
    assert got.count() == 21  # ids ≡ 2 mod 3 — nothing lost to skipping


def _convs(spark, ids):
    from pyspark.sql import functions as F

    return spark.range(0, 60).select(
        F.concat(F.lit("conv-"), (F.col("id") % 6).cast("string")).alias(
            "conv_id"
        ),
        F.col("id").alias("doc_id"),
    ).filter(F.col("conv_id").isin([f"conv-{i}" for i in ids]))


def test_bucket_partitioning_prunes_point_lookups(spark, table):
    S.commit_append(spark, _convs(spark, range(6)), table,
                    bucket_by=("conv_id", 4))
    snap = S.load_snapshot(table, 1)
    assert snap["partition_spec"] == ["conv_id", 4]
    assert len(snap["file_buckets"]) == len(snap["files"])

    all_files = S.plan_files(table)
    hit = S.plan_files(table, point={"conv_id": "conv-3"})
    assert 0 < len(hit) < len(all_files)
    got = S.read_table(spark, table, point={"conv_id": "conv-3"}).filter(
        "conv_id = 'conv-3'"
    )
    assert got.count() == 10  # nothing lost to pruning

    # spec is inherited: the next append buckets without re-passing it
    S.commit_append(spark, _convs(spark, [3]), table)
    snap2 = S.load_snapshot(table, 2)
    assert snap2["partition_spec"] == ["conv_id", 4]
    assert len(snap2["file_buckets"]) == len(snap2["files"])
    assert S.read_table(spark, table, point={"conv_id": "conv-3"}).filter(
        "conv_id = 'conv-3'"
    ).count() == 20


def test_bucket_tags_survive_rewrites_soundly(spark, table):
    S.commit_append(spark, _convs(spark, range(6)), table,
                    bucket_by=("conv_id", 4))
    # upsert rewrites conv-0's file(s); rewritten files lose their tag
    # (always read), carried files keep theirs — lookups stay complete
    S.commit_upsert(
        spark,
        spark.createDataFrame([("conv-0", 999)], "conv_id string, doc_id long"),
        table,
        key_cols=["conv_id", "doc_id"],
    )
    snap = S.load_snapshot(table, 2)
    assert snap["partition_spec"] == ["conv_id", 4]
    assert 0 < len(snap["file_buckets"]) < len(snap["files"])
    for conv in ("conv-0", "conv-3"):
        got = S.read_table(spark, table, point={"conv_id": conv}).filter(
            f"conv_id = '{conv}'"
        )
        assert got.count() == (11 if conv == "conv-0" else 10)
    # the driver-side bucket function matches the writer's expression
    fb = S.load_snapshot(table, 1)["file_buckets"]
    assert set(fb.values()) <= set(range(4))


def test_expire_vacuums_bucketed_commit_dirs(spark, table):
    """Bucket-partitioned appends nest parquet under _bucket=k/ subdirs;
    expiry must vacuum those recursively (this exact shape escaped the
    flat vacuum walk)."""
    import os

    S.commit_append(spark, _convs(spark, range(6)), table,
                    bucket_by=("conv_id", 4))
    S.compact(spark, table, target_partitions=1)
    r = S.expire_snapshots(table, keep_last=1)
    assert r["expired_snapshots"] == 1 and r["deleted_files"] > 0
    assert _ids(S.read_table(spark, table)) == list(range(60))
    live = set(S.load_snapshot(table, S.current_snapshot_id(table))["files"])
    on_disk = {
        os.path.relpath(os.path.join(root, n), table)
        for root, _, names in os.walk(os.path.join(table, "data"))
        for n in names
        if n.endswith(".parquet")
    }
    assert on_disk == live  # nothing dangling, nothing missing

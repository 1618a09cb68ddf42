"""Iceberg-style snapshot layer over the parquet results sink.

The production deployment writes to an Iceberg table (north rule); this
sandbox has no Iceberg runtime jar, so the table-format SEMANTICS the job
relies on are implemented over plain parquet + a JSON commit log
(documented fallback, same role as plans/lineage.py):

  <table_dir>/
    data/<commit-uuid>/part-*.parquet   immutable, append-only data files
    _snapshots/snap-00000001.json       full live-file manifest + summary
    _snapshots/HEAD                     current snapshot id (rename-atomic)

Guarantees (each pinned by tests/test_snapshots.py):

  * **Atomic commits** — a snapshot becomes visible only via POSIX
    ``os.rename`` of the HEAD pointer; readers never observe a partial
    file list (Iceberg delegates the same single swap to its catalog).
  * **Optimistic concurrency** — a commit records the HEAD it built on;
    if HEAD moved in the meantime the commit raises ``CommitConflict``
    and the caller retries on fresh state, exactly Iceberg's loop.
  * **Time travel** — every snapshot lists its FULL live-file set, so
    ``read_table(..., snapshot_id=k)`` reconstructs any historical state.
  * **Incremental scan** — files added strictly after snapshot ``k``
    (append-only changelog), the input side of resumable/CDC jobs.
  * **Keyed upsert (MERGE)** — copy-on-write at file granularity: only
    data files containing a matched key are rewritten; untouched files
    carry over, and incremental scans skip the replace commit (its files
    re-emit old rows), matching Iceberg's CoW MERGE + incremental-read
    rules.
  * **File skipping** — opt-in per-file [min, max] column bounds in the
    manifest (read from parquet footers at commit time, metadata-only);
    ``plan_files``/``read_table(prune=...)`` skip files that provably
    can't match a range predicate, Iceberg's scan planning. Sound by
    construction: files lacking stats are always kept.
  * **Z-order clustering** — ``cluster_by`` rewrites live rows in Morton
    order on N columns (one range shuffle, pure-integer z expression) so
    file skipping bites on every clustered column, Iceberg/Delta ZORDER.
  * **Additive schema evolution** — ``read_table(merge_schema=True)``
    unions file schemas; older files surface later-added columns as null.
  * **Row-level DELETE** — ``commit_delete`` rewrites only files that
    contain a matching row (manifest-pruned candidates, SQL NULL
    semantics, no-op commits nothing) — retention/GDPR purges.
  * **Changelog view** — ``table_diff`` emits insert/delete rows between
    ANY two snapshots (sees through upserts/deletes/compactions; files
    common to both snapshots cancel before any scan).
  * **Hidden bucket partitioning** — ``commit_append(bucket_by=(col, n))``
    tags each appended file with its hash bucket; point lookups
    (``read_table(point=...)``) read ~1/n of the files. The spec is
    inherited; rewrites untag rewritten files (untagged = always read).
  * **Rollback** — a new snapshot re-pointing at an old file set; history
    is never rewritten.
  * **Expiry** — drop old snapshots and vacuum data files no retained
    snapshot references.

Scale note: the manifest holds file PATHS, not data — a 100 TB table is
~10^5-10^6 parquet files, a few MB of JSON; reads hand Spark an explicit
file list so partition pruning and row-group pushdown work unchanged.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class CommitConflict(RuntimeError):
    """HEAD advanced between building a commit and publishing it."""


def _uri_to_path(uri: str) -> str:
    """``input_file_name()`` returns a URI (``file:/…``) whose path is
    percent-ENCODED; an os path must be decoded out of it before any
    comparison — a table path containing a space/%/# otherwise never
    matches, silently turning a delete into a no-op and an upsert into a
    duplicate-key append."""
    from urllib.parse import unquote, urlsplit

    parts = urlsplit(uri)
    if parts.scheme:
        return "/" + unquote(parts.path).lstrip("/")
    return "/" + uri.lstrip("/")


def _snap_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_snapshots")


def _head_path(table_dir: str) -> str:
    return os.path.join(_snap_dir(table_dir), "HEAD")


def _snap_path(table_dir: str, snapshot_id: int) -> str:
    return os.path.join(_snap_dir(table_dir), f"snap-{snapshot_id:08d}.json")


def current_snapshot_id(table_dir: str) -> int | None:
    try:
        with open(_head_path(table_dir)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def load_snapshot(table_dir: str, snapshot_id: int) -> dict:
    with open(_snap_path(table_dir, snapshot_id)) as f:
        return json.load(f)


def snapshots(table_dir: str) -> list[dict]:
    """Commit log, oldest first (empty for an uninitialized table)."""
    d = _snap_dir(table_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("snap-") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def _publish(table_dir: str, snap: dict, expected_parent: int | None) -> int:
    """Write the snapshot JSON, then atomically swing HEAD — refusing if
    HEAD no longer equals the snapshot's parent (optimistic concurrency).

    The conflict check and the rename are two steps; Iceberg closes that
    window with the catalog's compare-and-swap. At sandbox fidelity the
    rename IS the atom (single-writer per table directory, the job's
    deployment shape), and the check turns a lost-update into a retryable
    error for overlapping drivers."""
    if current_snapshot_id(table_dir) != expected_parent:
        raise CommitConflict(
            f"HEAD moved: expected {expected_parent}, "
            f"found {current_snapshot_id(table_dir)}"
        )
    os.makedirs(_snap_dir(table_dir), exist_ok=True)
    sid = int(snap["snapshot_id"])
    with open(_snap_path(table_dir, sid), "w") as f:
        json.dump(snap, f, sort_keys=True)
    tmp = _head_path(table_dir) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(str(sid))
    if current_snapshot_id(table_dir) != expected_parent:
        os.remove(tmp)
        raise CommitConflict("HEAD moved during publish")
    os.rename(tmp, _head_path(table_dir))
    return sid


def _jsonable_stat(v):
    """Footer min/max → JSON-storable value (numbers and strings carry
    their type; anything else stringifies, which keeps ordering only for
    homogeneous values — the caller's stat columns should be numeric or
    string, like Iceberg's recommended sort/partition columns)."""
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (int, float, str)):
        return v
    return str(v)


def _collect_file_stats(
    table_dir: str, rel_paths: list[str], stat_cols: list[str]
) -> dict:
    """Per-file [min, max] for each stat column, merged across row
    groups — read from the parquet FOOTERS (metadata-only, no data
    scan; this is exactly where Iceberg's manifest column bounds come
    from). A column with absent/unusable footer stats in a file simply
    has no entry for that file (that file is never skipped)."""
    import pyarrow.parquet as pq

    out: dict = {}
    for rel in rel_paths:
        md = pq.ParquetFile(os.path.join(table_dir, rel)).metadata
        colstats = {}
        for c in stat_cols:
            lo = hi = None
            usable = True
            for rg in range(md.num_row_groups):
                grp = md.row_group(rg)
                found = False
                for ci in range(grp.num_columns):
                    col = grp.column(ci)
                    if col.path_in_schema != c:
                        continue
                    found = True
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        usable = False
                        break
                    mn, mx = _jsonable_stat(st.min), _jsonable_stat(st.max)
                    if mn is None or mx is None:
                        usable = False
                        break
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
                if not found or not usable:
                    usable = False
                    break
            if usable and lo is not None:
                colstats[c] = [lo, hi]
        out[rel] = colstats
    return out


def _inherited_stats(
    table_dir: str,
    parent: int | None,
    carried: list[str],
    added: list[str],
    stat_cols: list[str] | None,
) -> tuple[list[str], dict]:
    """Resolve the commit's stat columns (explicit, else inherited from
    the parent snapshot) and build its stats map: carried files keep the
    parent's entries, added files get fresh footer reads."""
    parent_snap = load_snapshot(table_dir, parent) if parent else {}
    cols = (
        stat_cols
        if stat_cols is not None
        else parent_snap.get("stat_cols", [])
    )
    prev_stats = parent_snap.get("stats", {})
    stats = {p: prev_stats[p] for p in carried if p in prev_stats}
    if cols:
        stats.update(_collect_file_stats(table_dir, added, cols))
    return cols, stats


def bucket_of(value, n_buckets: int) -> int:
    """Driver-side twin of the writer's bucket transform: md5 hex chars
    17-24 (bytes 8..12, big-endian) mod n — a 32-bit value, so the
    Spark expression (conv/substring on md5) and this Python form are
    exact everywhere (never the double-precision md5-lower-64 helper,
    whose low bits are lossy)."""
    import hashlib

    h = hashlib.md5(str(value).encode("utf-8")).hexdigest()
    return int(h[16:24], 16) % n_buckets


def _bucket_expr(col: str, n_buckets: int):
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 17, 8), 16, 10)
        .cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def commit_append(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    summary_extra: dict | None = None,
    stat_cols: list[str] | None = None,
    bucket_by: tuple[str, int] | None = None,
) -> int:
    """Append ``df`` as a new snapshot; returns the new snapshot id.

    Data lands under a fresh UUID directory first (invisible to readers —
    no snapshot references it yet), then the manifest commit makes it
    live. A crash between the two leaves orphan files that
    ``expire_snapshots`` vacuums, never a partial table state.

    ``summary_extra`` merges caller metadata into the snapshot summary —
    the idempotence key for streaming sinks (Iceberg stores Structured
    Streaming's batch id the same way, in snapshot summary properties).

    ``stat_cols`` opts the table into manifest file-skipping: per-file
    [min, max] bounds for those columns land in the snapshot (read from
    parquet footers, metadata-only) and ``read_table(..., prune=...)`` /
    ``plan_files`` skip files whose range can't match. Once set, later
    commits inherit the columns without re-passing them.

    ``bucket_by=(col, n)`` opts the table into Iceberg's hidden
    ``bucket(n, col)`` partition transform: each append splits its rows
    into hash buckets (one file group per bucket), the manifest records
    each file's bucket, and a point lookup
    (``read_table(..., point={col: value})`` / ``plan_files``) reads
    only ~1/n of the files — the north-rule "bucketed on conv_id"
    layout, at the table layer. The spec is inherited by later commits
    like ``stat_cols``; rewrite commits (upsert/delete/compact) carry
    bucket tags for untouched files and leave rewritten files untagged
    (untagged files are always read — pruning stays sound)."""
    parent = current_snapshot_id(table_dir)
    parent_snap = load_snapshot(table_dir, parent) if parent else {}
    prev_files = parent_snap.get("files", [])
    spec = bucket_by or (
        tuple(parent_snap["partition_spec"])
        if parent_snap.get("partition_spec")
        else None
    )
    commit_uuid = uuid.uuid4().hex
    data_dir = os.path.join(table_dir, "data", commit_uuid)
    new_buckets: dict[str, int] = {}
    if spec:
        bcol, n_b = spec
        df.withColumn("_bucket", _bucket_expr(bcol, n_b)).write.mode(
            "error"
        ).partitionBy("_bucket").parquet(data_dir)
        added = []
        for sub in sorted(os.listdir(data_dir)):
            if not sub.startswith("_bucket="):
                continue
            k = int(sub.split("=", 1)[1])
            for name in sorted(os.listdir(os.path.join(data_dir, sub))):
                if name.endswith(".parquet"):
                    rel = os.path.join("data", commit_uuid, sub, name)
                    added.append(rel)
                    new_buckets[rel] = k
        added.sort()
    else:
        df.write.mode("error").parquet(data_dir)
        added = sorted(
            os.path.join("data", commit_uuid, name)
            for name in os.listdir(data_dir)
            if name.endswith(".parquet")
        )
    added_rows = (
        spark.read.parquet(*[os.path.join(table_dir, p) for p in added]).count()
        if added
        else 0
    )
    cols, stats = _inherited_stats(table_dir, parent, prev_files, added, stat_cols)
    snap = {
        "snapshot_id": (parent or 0) + 1,
        "parent_id": parent,
        "operation": "append",
        "files": prev_files + added,
        "stat_cols": cols,
        "stats": stats,
        "summary": {
            "added_files": len(added),
            "added_rows": added_rows,
            "total_files": len(prev_files) + len(added),
            **(summary_extra or {}),
        },
    }
    if spec:
        snap["partition_spec"] = list(spec)
        snap["file_buckets"] = {
            **{
                p: parent_snap.get("file_buckets", {})[p]
                for p in prev_files
                if p in parent_snap.get("file_buckets", {})
            },
            **new_buckets,
        }
    return _publish(table_dir, snap, parent)


def _inherited_partitions(parent_snap: dict, carried: list[str]) -> dict:
    """Partition spec + bucket tags surviving a rewrite commit: carried
    files keep their tags; rewritten/new files are untagged, and untagged
    files are always read — pruning stays sound through any rewrite."""
    if not parent_snap.get("partition_spec"):
        return {}
    fb = parent_snap.get("file_buckets", {})
    return {
        "partition_spec": parent_snap["partition_spec"],
        "file_buckets": {p: fb[p] for p in carried if p in fb},
    }


def commit_upsert(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    key_cols: list[str],
    summary_extra: dict | None = None,
) -> int:
    """MERGE (keyed upsert) with copy-on-write semantics: rows in ``df``
    replace live rows sharing their key; unmatched rows insert. Keys in
    ``df`` must be unique (one row per key per batch — the caller's
    ingest contract, as in Iceberg's MERGE cardinality check).

    Copy-on-write at FILE granularity, like Iceberg's CoW writer: only
    data files that actually contain a matched key are rewritten (their
    surviving rows re-emitted alongside the upsert batch); every other
    live file is carried into the new snapshot untouched. The
    matched-file discovery is a broadcast semi-join of the table against
    the batch's (small) key set, and the only driver-side collect is the
    distinct FILE LIST — bounded by file count, i.e. manifest-scale
    metadata, never row data.

    The commit's operation is ``overwrite``: ``incremental_scan`` skips
    it (its new files contain OLD rows a changelog consumer has already
    seen), exactly as Iceberg's incremental reads skip replace commits."""
    from pyspark.sql import functions as F

    parent = current_snapshot_id(table_dir)
    if parent is None:
        return commit_append(spark, df, table_dir, summary_extra=summary_extra)
    prev_snap = load_snapshot(table_dir, parent)
    prev_files = prev_snap["files"]
    abs_of = {p: os.path.join(table_dir, p) for p in prev_files}
    cur = spark.read.parquet(*abs_of.values()).withColumn(
        "_file", F.input_file_name()
    )
    keys = df.select(*key_cols).distinct()
    hit_uris = {
        r["_file"]
        for r in cur.join(F.broadcast(keys), key_cols, "left_semi")
        .select("_file")
        .distinct()
        .collect()
    }

    hit_paths = {os.path.normpath(_uri_to_path(u)) for u in hit_uris}
    rewritten = [
        p for p in prev_files if os.path.normpath(abs_of[p]) in hit_paths
    ]
    carried = [p for p in prev_files if p not in set(rewritten)]

    out = df
    if rewritten:
        # mergeSchema + allowMissingColumns: surviving rows re-emit with
        # their full (possibly evolved) schema even when the upsert batch
        # predates/postdates an additive-evolution commit
        survivors = spark.read.option("mergeSchema", "true").parquet(
            *[abs_of[p] for p in rewritten]
        ).join(F.broadcast(keys), key_cols, "left_anti")
        out = survivors.unionByName(df, allowMissingColumns=True)
    commit_uuid = uuid.uuid4().hex
    data_dir = os.path.join(table_dir, "data", commit_uuid)
    out.write.mode("error").parquet(data_dir)
    added = sorted(
        os.path.join("data", commit_uuid, name)
        for name in os.listdir(data_dir)
        if name.endswith(".parquet")
    )
    cols, stats = _inherited_stats(table_dir, parent, carried, added, None)
    snap = {
        "snapshot_id": (parent or 0) + 1,
        "parent_id": parent,
        "operation": "overwrite",
        "files": carried + added,
        "stat_cols": cols,
        "stats": stats,
        "summary": {
            "files_rewritten": len(rewritten),
            "files_carried": len(carried),
            "added_files": len(added),
            "total_files": len(carried) + len(added),
            **(summary_extra or {}),
        },
    }
    snap.update(_inherited_partitions(prev_snap, carried))
    return _publish(table_dir, snap, parent)


def commit_delete(
    spark: SparkSession,
    table_dir: str,
    predicate: str,
    prune: dict[str, tuple] | None = None,
    summary_extra: dict | None = None,
) -> int:
    """DELETE WHERE ``predicate`` (a Spark SQL boolean expression) with
    copy-on-write semantics — the row-level delete a retention policy or
    a GDPR purge issues against the table.

    Two-level candidate discovery, like Iceberg's CoW delete: first the
    caller-supplied ``prune`` bounds skip files via manifest stats
    (metadata only, sound — files without stats stay candidates), then
    one scan over the surviving candidates finds which files actually
    contain a matching row. Only those files rewrite (their non-matching
    rows re-emitted); every other live file carries into the new
    snapshot untouched. The only driver-side collect is the per-file
    match count — manifest-scale metadata.

    Deletes rows where the predicate is TRUE; rows where it evaluates
    NULL survive (SQL DELETE semantics). A predicate matching nothing is
    a no-op: no new snapshot, the current id returns unchanged. The
    commit's operation is ``delete`` — ``incremental_scan`` skips it
    (non-append), so changelog consumers never re-see the survivors."""
    from pyspark.sql import functions as F

    parent = current_snapshot_id(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no snapshot to delete from in {table_dir}")
    prev_snap = load_snapshot(table_dir, parent)
    prev_files = prev_snap["files"]
    abs_of = {p: os.path.join(table_dir, p) for p in prev_files}
    candidates = plan_files(table_dir, prune, parent) if prune else prev_files
    pred = F.expr(predicate)

    hits: dict[str, int] = {}
    if candidates:
        per_file = (
            spark.read.parquet(*[abs_of[p] for p in candidates])
            .filter(pred)
            .groupBy(F.input_file_name().alias("_file"))
            .count()
            .collect()
        )

        by_path = {
            os.path.normpath(_uri_to_path(r["_file"])): r["count"]
            for r in per_file
        }
        hits = {
            p: by_path[os.path.normpath(abs_of[p])]
            for p in candidates
            if os.path.normpath(abs_of[p]) in by_path
        }
    if not hits:
        return parent  # nothing matched: no-op, no new snapshot

    rewritten = [p for p in prev_files if p in hits]
    carried = [p for p in prev_files if p not in hits]
    survivors = spark.read.option("mergeSchema", "true").parquet(
        *[abs_of[p] for p in rewritten]
    ).filter(~pred.eqNullSafe(True))
    commit_uuid = uuid.uuid4().hex
    data_dir = os.path.join(table_dir, "data", commit_uuid)
    survivors.write.mode("error").parquet(data_dir)
    added = sorted(
        os.path.join("data", commit_uuid, name)
        for name in os.listdir(data_dir)
        if name.endswith(".parquet")
    )
    cols, stats = _inherited_stats(table_dir, parent, carried, added, None)
    snap = {
        "snapshot_id": parent + 1,
        "parent_id": parent,
        "operation": "delete",
        "files": carried + added,
        "stat_cols": cols,
        "stats": stats,
        "summary": {
            "predicate": predicate,
            "rows_deleted": sum(hits.values()),
            "files_rewritten": len(rewritten),
            "files_carried": len(carried),
            "added_files": len(added),
            "total_files": len(carried) + len(added),
            **(summary_extra or {}),
        },
    }
    snap.update(_inherited_partitions(prev_snap, carried))
    return _publish(table_dir, snap, parent)


def rollback(table_dir: str, to_snapshot_id: int) -> int:
    """Make an old snapshot's state current via a NEW snapshot (history is
    append-only; nothing is rewritten)."""
    parent = current_snapshot_id(table_dir)
    target = load_snapshot(table_dir, to_snapshot_id)
    snap = {
        "snapshot_id": (parent or 0) + 1,
        "parent_id": parent,
        "operation": "rollback",
        "rolled_back_to": to_snapshot_id,
        "files": target["files"],
        "stat_cols": target.get("stat_cols", []),
        "stats": target.get("stats", {}),
        "summary": {"total_files": len(target["files"])},
    }
    snap.update(_inherited_partitions(target, target["files"]))
    return _publish(table_dir, snap, parent)


def _resolve_files(table_dir: str, snapshot_id: int | None) -> list[str]:
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(table_dir)
    if sid is None:
        return []
    return load_snapshot(table_dir, sid)["files"]


def plan_files(
    table_dir: str,
    prune: dict[str, tuple] | None = None,
    snapshot_id: int | None = None,
    point: dict | None = None,
) -> list[str]:
    """The file list a scan with predicate ``prune`` must read — manifest
    file-skipping, Iceberg's scan planning. ``prune`` maps column →
    (lo, hi) inclusive bounds (either side None = unbounded); a file is
    skipped only when its manifest [min, max] provably cannot intersect
    EVERY bound. Files without stats for a pruned column are always kept
    (skipping must be sound, never guessy). Pure metadata — no Spark, no
    file opens; at 10^5-10^6 files this is a driver-side pass over a
    few MB of JSON, the same cost profile as Iceberg manifest pruning.

    ``point`` maps the table's bucket column → an equality value: when
    the table carries a ``bucket_by`` partition spec, only files tagged
    with that value's bucket (plus untagged files — sound) are read,
    Iceberg's hidden-partitioning point lookup."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(table_dir)
    if sid is None:
        return []
    snap = load_snapshot(table_dir, sid)
    files = list(snap["files"])
    if point and snap.get("partition_spec"):
        bcol, n_b = snap["partition_spec"]
        if bcol in point:
            target = bucket_of(point[bcol], int(n_b))
            fb = snap.get("file_buckets", {})
            files = [p for p in files if fb.get(p, target) == target]
    if not prune:
        return files
    stats = snap.get("stats", {})
    kept = []
    for p in files:
        fstats = stats.get(p, {})
        keep = True
        for col, (lo, hi) in prune.items():
            if col not in fstats:
                continue
            fmin, fmax = fstats[col]
            if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
                keep = False
                break
        if keep:
            kept.append(p)
    return kept


def read_table(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    prune: dict[str, tuple] | None = None,
    merge_schema: bool = False,
    point: dict | None = None,
) -> DataFrame:
    """Read the table as of HEAD, or any historical snapshot (time
    travel). ``prune`` skips files via manifest stats (``plan_files``);
    it is an ADVISORY scan reduction, not a filter — kept files can
    still carry non-matching rows, so the caller applies the real
    predicate on the returned frame (Spark then also pushes it into the
    surviving files' row groups — two-level skipping, manifest + footer,
    exactly Iceberg's read path).

    ``merge_schema`` supports additive schema evolution (a later commit
    appended files with NEW columns): the scan unions all file schemas
    and older files surface the new columns as null, Iceberg's
    add-column semantics. Off by default — merging reads every file's
    footer at planning time; a fixed-schema table shouldn't pay it."""
    files = plan_files(table_dir, prune, snapshot_id, point=point)
    reader = spark.read.option("mergeSchema", "true") if merge_schema else spark.read
    if not files:
        live = _resolve_files(table_dir, snapshot_id)
        if live:
            # pruned to nothing: empty frame, schema from the live files
            paths = [os.path.join(table_dir, p) for p in live]
            return (
                reader.parquet(*paths).limit(0)
                if merge_schema
                else reader.parquet(paths[0]).limit(0)
            )
        raise FileNotFoundError(f"no snapshot to read in {table_dir}")
    return reader.parquet(*[os.path.join(table_dir, p) for p in files])


def incremental_scan(
    spark: SparkSession,
    table_dir: str,
    since_snapshot_id: int,
    until_snapshot_id: int | None = None,
) -> DataFrame | None:
    """Rows appended AFTER ``since`` (exclusive) up to ``until``/HEAD
    (inclusive) — the append-only changelog an incremental consumer reads
    instead of re-scanning the table. Returns None when there is no delta.

    Only ``append`` snapshots contribute: a ``compact`` (rewrite) snapshot
    adds files that contain OLD rows, so a naive file-set diff would
    re-deliver data a consumer already processed — exactly why Iceberg's
    incremental reads skip replace snapshots. Each append's delta is its
    file list minus its parent's."""
    until = (
        until_snapshot_id
        if until_snapshot_id is not None
        else current_snapshot_id(table_dir)
    )
    if until is None:
        return None
    new: list[str] = []
    for s in snapshots(table_dir):
        sid = int(s["snapshot_id"])
        if since_snapshot_id < sid <= until and s["operation"] == "append":
            parent = s["parent_id"]
            prev = set(
                load_snapshot(table_dir, parent)["files"] if parent else []
            )
            new.extend(p for p in s["files"] if p not in prev)
    if not new:
        return None
    return spark.read.parquet(
        *[os.path.join(table_dir, p) for p in sorted(set(new))]
    )


def table_diff(
    spark: SparkSession,
    table_dir: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Row-level changelog between two snapshots — Iceberg's
    create_changelog_view. Unlike ``incremental_scan`` (append commits
    only), this sees through upserts, deletes, and rollbacks: it returns
    every row present in ``to`` but not ``from`` tagged ``insert``, and
    every row present in ``from`` but not ``to`` tagged ``delete``
    (bag semantics — duplicate rows diff by multiplicity).

    Scale design: files common to both snapshots cancel BEFORE any scan
    (pure manifest set-diff, driver-side metadata), so a diff across a
    mostly-unchanged table reads only the files that actually changed —
    compaction-style rewrites that shuffle rows between files still
    compare correctly because the surviving identical rows cancel in the
    exceptAll. The two exceptAll anti-bags shuffle only the differing
    files' rows."""
    to_id = (
        to_snapshot_id
        if to_snapshot_id is not None
        else current_snapshot_id(table_dir)
    )
    files_a = set(_resolve_files(table_dir, from_snapshot_id))
    files_b = set(_resolve_files(table_dir, to_id))
    if not files_a and not files_b:
        raise FileNotFoundError(
            f"both snapshots of {table_dir} are empty — no schema to diff"
        )

    def _read(paths: set[str], schema_from: set[str]) -> DataFrame:
        # mergeSchema: either side may span an additive schema-evolution
        # boundary (its own files can disagree with each other)
        if paths:
            return spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(table_dir, p) for p in sorted(paths)]
            )
        ref = sorted(schema_from)[0]
        return spark.read.parquet(os.path.join(table_dir, ref)).limit(0)

    only_a, only_b = files_a - files_b, files_b - files_a
    if not only_a and not only_b:
        empty = _read(set(), files_a or files_b)
        return empty.withColumn("_change_type", F.lit("insert"))
    old = _read(only_a, files_b)
    new = _read(only_b, files_a)
    # align the two sides to the union of their columns with null-fill
    # (unionByName(allowMissingColumns) semantics) so a diff across an
    # additive-evolution boundary compares instead of throwing — an old
    # row re-read through the widened schema carries nulls in the new
    # columns and still cancels in the exceptAll
    all_cols = list(dict.fromkeys([*old.columns, *new.columns]))
    for c in all_cols:
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
        if c not in new.columns:
            new = new.withColumn(c, F.lit(None).cast(old.schema[c].dataType))
    old, new = old.select(*all_cols), new.select(*all_cols)
    return new.exceptAll(old).withColumn(
        "_change_type", F.lit("insert")
    ).unionByName(
        old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
    )


def compact(
    spark: SparkSession, table_dir: str, target_partitions: int = 1
) -> int:
    """Rewrite the table's live files into ``target_partitions`` larger
    files and commit the result as a ``compact`` snapshot — the
    small-files maintenance every long-lived append table needs (each
    micro-batch/ingest commit leaves small parquet files; scan cost
    tracks file count). Readers see an atomic swap, time travel to
    pre-compaction snapshots still works (old files stay until
    ``expire_snapshots``), and incremental consumers skip the rewrite
    (``incremental_scan`` reads only append deltas)."""
    parent = current_snapshot_id(table_dir)
    # merge_schema: a rewrite across an additive-evolution boundary must
    # carry the union schema — a single-file-schema read silently drops
    # the evolved columns from every row it rewrites
    df = read_table(spark, table_dir, merge_schema=True)
    commit_uuid = uuid.uuid4().hex
    data_dir = os.path.join(table_dir, "data", commit_uuid)
    df.coalesce(target_partitions).write.mode("error").parquet(data_dir)
    files = sorted(
        os.path.join("data", commit_uuid, name)
        for name in os.listdir(data_dir)
        if name.endswith(".parquet")
    )
    cols, stats = _inherited_stats(table_dir, parent, [], files, None)
    snap = {
        "snapshot_id": (parent or 0) + 1,
        "parent_id": parent,
        "operation": "compact",
        "files": files,
        "stat_cols": cols,
        "stats": stats,
        "summary": {"total_files": len(files)},
    }
    if parent:
        snap.update(_inherited_partitions(load_snapshot(table_dir, parent), []))
    return _publish(table_dir, snap, parent)


ZORDER_BITS = 8  # 256 cells per dimension — plenty for file-level locality


def _zorder_key(df: DataFrame, c: str):
    """Numeric ordering key for a clustered column. Numerics cast to
    double; STRINGS encode their first four bytes big-endian (ascii ×
    256^k) — order-preserving on the prefix, which is exactly the
    locality Z-ordering needs (Iceberg's string zorder truncates the
    same way). Null/short strings pad with 0, sorting first."""
    from pyspark.sql.types import StringType

    if isinstance(df.schema[c].dataType, StringType):
        def byte(i: int):
            return F.coalesce(
                F.ascii(F.substring(F.col(c), i, 1)).cast("double"),
                F.lit(0.0),
            )

        return (
            byte(1) * 16777216.0
            + byte(2) * 65536.0
            + byte(3) * 256.0
            + byte(4)
        )
    return F.col(c).cast("double")


def _zvalue(keys: dict, mins: dict, maxs: dict):
    """Morton/Z-value expression: each column's ordering key scales
    linearly into [0, 2^bits) against its broadcast global min/max, then
    the bits interleave. Pure integer column arithmetic — no UDF,
    whole-stage codegen keeps it JVM-side."""
    top = (1 << ZORDER_BITS) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(keys):
        span = max(float(maxs[c] - mins[c]), 1e-12)
        scaled = F.floor(
            (keys[c] - float(mins[c])) / span * top + 0.5
        ).cast("long")
        for b in range(ZORDER_BITS):
            bit = F.shiftright(scaled, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * len(keys) + i)
    return z


def cluster_by(
    spark: SparkSession,
    table_dir: str,
    cols: list[str],
    target_files: int = 8,
) -> int:
    """Z-order the table's live rows on ``cols`` and commit the rewrite —
    the data-layout maintenance that makes manifest file-skipping bite on
    MULTIPLE columns at once (a plain sort helps only its leading
    column; Morton interleaving gives every clustered column locality,
    Iceberg/Delta's ZORDER). Files are cut along z-ranges
    (``repartitionByRange`` on the z-value — one range shuffle) so each
    file covers a compact hyper-rectangle and its manifest [min, max]
    bounds turn range predicates on ANY clustered column into file
    skips. A ``cluster`` commit is a rewrite: incremental consumers skip
    it, time travel to the unclustered layout still works, and the
    cluster columns join the table's stat columns so the new bounds land
    in the manifest."""
    from pyspark.sql import functions as F

    parent = current_snapshot_id(table_dir)
    # merge_schema: same rewrite-across-evolution rule as compact()
    df = read_table(spark, table_dir, merge_schema=True)
    keys = {c: _zorder_key(df, c) for c in cols}
    bounds = df.groupBy().agg(
        *[F.min(keys[c]).alias(f"min_{c}") for c in cols],
        *[F.max(keys[c]).alias(f"max_{c}") for c in cols],
    ).collect()[0]
    mins = {c: bounds[f"min_{c}"] for c in cols}
    maxs = {c: bounds[f"max_{c}"] for c in cols}
    z = _zvalue(keys, mins, maxs)
    out = (
        df.withColumn("_z", z)
        .repartitionByRange(target_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    commit_uuid = uuid.uuid4().hex
    data_dir = os.path.join(table_dir, "data", commit_uuid)
    out.write.mode("error").parquet(data_dir)
    files = sorted(
        os.path.join("data", commit_uuid, name)
        for name in os.listdir(data_dir)
        if name.endswith(".parquet")
    )
    parent_cols = load_snapshot(table_dir, parent).get("stat_cols", []) if parent else []
    stat_cols = list(dict.fromkeys([*parent_cols, *cols]))
    stats = _collect_file_stats(table_dir, files, stat_cols)
    snap = {
        "snapshot_id": (parent or 0) + 1,
        "parent_id": parent,
        "operation": "cluster",
        "files": files,
        "stat_cols": stat_cols,
        "stats": stats,
        "summary": {"total_files": len(files), "cluster_cols": cols},
    }
    if parent:
        snap.update(_inherited_partitions(load_snapshot(table_dir, parent), []))
    return _publish(table_dir, snap, parent)


def expire_snapshots(table_dir: str, keep_last: int = 1) -> dict:
    """Drop all but the last ``keep_last`` snapshots and vacuum data files
    (and crash-orphaned commit dirs) no retained snapshot references."""
    log = snapshots(table_dir)
    if not log:
        return {"expired_snapshots": 0, "deleted_files": 0}
    keep = log[-keep_last:]
    expired = log[:-keep_last]
    live = {p for s in keep for p in s["files"]}
    deleted = 0
    data_root = os.path.join(table_dir, "data")
    if os.path.isdir(data_root):
        for commit_uuid in sorted(os.listdir(data_root)):
            cdir = os.path.join(data_root, commit_uuid)
            # walk bottom-up: bucket-partitioned commits nest their
            # parquet under _bucket=k/ subdirectories
            for root, dirs, names in os.walk(cdir, topdown=False):
                for name in sorted(names):
                    rel = os.path.relpath(os.path.join(root, name), table_dir)
                    if name.endswith(".parquet") and rel not in live:
                        os.remove(os.path.join(root, name))
                        deleted += 1
                if not any(
                    n.endswith(".parquet")
                    for _, _, fs in os.walk(root)
                    for n in fs
                ):
                    for leftover in os.listdir(root):
                        path = os.path.join(root, leftover)
                        if os.path.isfile(path):
                            os.remove(path)
                    if not os.listdir(root):
                        os.rmdir(root)
    for s in expired:
        os.remove(_snap_path(table_dir, int(s["snapshot_id"])))
    return {"expired_snapshots": len(expired), "deleted_files": deleted}

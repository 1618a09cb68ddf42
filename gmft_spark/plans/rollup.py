"""Incremental materialized-view maintenance over the snapshot changelog.

A production pipeline keeps aggregate tables (per-source doc counts,
token totals, quality histograms) next to its fact tables; recomputing
them from scratch after every ingest batch re-scans the world. This
module maintains a grouped rollup INCREMENTALLY from a snapshot table's
append changelog (``snapshots.incremental_scan``), composing the table
layer's own primitives:

* the rollup state IS a snapshot table — atomic publish, time travel,
  and copy-on-write MERGE come for free;
* each refresh aggregates ONLY the delta (files appended since the last
  refreshed snapshot), merges it with the prior state of the AFFECTED
  groups, and commits with ``commit_upsert`` keyed on the group columns
  (only state files containing touched groups rewrite);
* the source watermark (last refreshed snapshot id) rides in the rollup
  commit's summary, so the state and its watermark move in ONE atomic
  step — a crash between ingest and refresh, or a replayed refresh,
  re-aggregates the same delta into the same rows and the upsert
  converges (exactly-once effect on at-least-once calls).

Scale notes: the delta aggregation is one map-side-combinable groupBy
over the new files only; the prior-state read is pruned to affected
groups with a broadcast semi-join; everything else is manifest-scale
metadata. All sums must be over integer (or fixed-point) columns — the
merge re-adds partial sums, which is only order-safe exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gmft_spark.plans import snapshots as S


def last_refreshed_snapshot(rollup_table: str) -> int:
    """Source watermark: the highest source snapshot id any rollup
    commit recorded (0 = never refreshed)."""
    return max(
        (
            s["summary"].get("source_snapshot_id", 0)
            for s in S.snapshots(rollup_table)
        ),
        default=0,
    )


def refresh_rollup(
    spark: SparkSession,
    source_table: str,
    rollup_table: str,
    keys: list[str],
    sum_cols: list[str],
) -> dict:
    """Bring the rollup (count + integer sums per ``keys`` group) up to
    the source table's HEAD by aggregating only the appended delta.
    Returns {"refreshed": bool, "source_snapshot_id": int}."""
    last = last_refreshed_snapshot(rollup_table)
    head = S.current_snapshot_id(source_table)
    if head is None:
        return {"refreshed": False, "source_snapshot_id": last}
    # the watermark moves with the delta atomically only if both cover the
    # SAME snapshot range: scan up to the captured head explicitly, or an
    # append landing between the two calls would be aggregated now but
    # re-delivered (and double-counted) by the next refresh
    source_snaps = S.snapshots(source_table)
    retained = {int(s["snapshot_id"]) for s in source_snaps}
    # ids in (last, head] must all survive: an EXPIRED snapshot there may
    # have been an append whose rows incremental_scan would silently skip
    missing = [i for i in range(last + 1, head + 1) if i not in retained]
    # and every retained append in range diffs against its parent's file
    # list, so that parent must also be loadable (the parent of the first
    # new append can be the already-consumed watermark snapshot itself —
    # fine for it to be expired ONLY if no append still needs it)
    missing += [
        p
        for s in source_snaps
        if s["operation"] == "append"
        and last < int(s["snapshot_id"]) <= head
        and (p := s["parent_id"]) is not None
        and p not in retained
    ]
    if missing:
        raise ValueError(
            f"refresh_rollup: source snapshots {sorted(set(missing))} needed "
            f"for the delta ({last}, {head}] were expired before the rollup "
            f"consumed it — the rollup can no longer be maintained "
            f"incrementally; recompute it from scratch (source expiry must "
            f"keep snapshots back to every consumer's watermark)"
        )
    delta = S.incremental_scan(spark, source_table, last, until_snapshot_id=head)
    if delta is None:
        return {"refreshed": False, "source_snapshot_id": last}

    partial = delta.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )
    if S.current_snapshot_id(rollup_table) is not None:
        prior = S.read_table(spark, rollup_table)
        affected = prior.join(
            F.broadcast(partial.select(*keys)), keys, "left_semi"
        )
        merged = (
            affected.unionByName(partial)
            .groupBy(*keys)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
            )
        )
        S.commit_upsert(
            spark,
            merged,
            rollup_table,
            key_cols=keys,
            summary_extra={"source_snapshot_id": head},
        )
    else:
        S.commit_append(
            spark,
            partial,
            rollup_table,
            summary_extra={"source_snapshot_id": head},
        )
    return {"refreshed": True, "source_snapshot_id": head}

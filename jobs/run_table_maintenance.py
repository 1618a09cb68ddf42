"""Table-maintenance job: the housekeeping a long-lived snapshot table
needs, as one spark-submit entrypoint over the plans/snapshots.py
primitives. Each action is its own atomic commit; actions run in the
order given below and each prints one status line, so an operator can
read the run like a commit log.

    zip -r gmft_spark.zip gmft_spark
    spark-submit --master <cluster> --py-files gmft_spark.zip \\
        jobs/run_table_maintenance.py --table s3://.../corpus/ \\
        --delete "quality < 0.05" \\
        --compact 32 --zorder conv_id,turn_idx \\
        --rollup-table s3://.../corpus_stats/ --rollup-keys conv_id \\
        --rollup-sums n_tokens \\
        --expire-keep 5

Ordering rationale: row deletes first (no point compacting rows about to
die), then compaction/clustering (layout), then the rollup refresh
(reads the append changelog, which deletes/compactions don't disturb),
then snapshot expiry last (everything above adds history; expiry trims
it and vacuums unreferenced files)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--table", required=True, help="snapshot table dir")
    parser.add_argument(
        "--delete",
        default=None,
        metavar="PREDICATE",
        help="row-level DELETE WHERE (Spark SQL boolean expression; "
        "copy-on-write, only matching files rewrite)",
    )
    parser.add_argument(
        "--compact",
        type=int,
        default=None,
        metavar="N",
        help="rewrite live files into N larger files",
    )
    parser.add_argument(
        "--zorder",
        default=None,
        metavar="COLS",
        help="comma-separated columns to Z-order cluster on",
    )
    parser.add_argument("--zorder-files", type=int, default=8)
    parser.add_argument(
        "--rollup-table",
        default=None,
        help="refresh this incremental rollup from the table's changelog",
    )
    parser.add_argument("--rollup-keys", default="conv_id")
    parser.add_argument("--rollup-sums", default="")
    parser.add_argument(
        "--expire-keep",
        type=int,
        default=None,
        metavar="N",
        help="expire all but the last N snapshots and vacuum their files",
    )
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)
    if not any(
        (args.delete, args.compact, args.zorder, args.rollup_table,
         args.expire_keep)
    ):
        parser.error("no maintenance action given")

    from pyspark.sql import SparkSession

    from gmft_spark.plans import snapshots as S

    builder = SparkSession.builder.appName("gmft-spark-maintain")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    if args.delete:
        head = S.current_snapshot_id(args.table)
        sid = S.commit_delete(spark, args.table, args.delete)
        if sid == head:
            print(f"delete: no rows match {args.delete!r} (no-op)")
        else:
            n = S.load_snapshot(args.table, sid)["summary"]["rows_deleted"]
            print(f"delete: snapshot {sid}, {n} rows deleted")
    if args.compact:
        sid = S.compact(spark, args.table, target_partitions=args.compact)
        total = S.load_snapshot(args.table, sid)["summary"]["total_files"]
        print(f"compact: snapshot {sid}, {total} files")
    if args.zorder:
        cols = [c for c in args.zorder.split(",") if c]
        sid = S.cluster_by(
            spark, args.table, cols, target_files=args.zorder_files
        )
        print(f"zorder: snapshot {sid}, clustered on {','.join(cols)}")
    if args.rollup_table:
        from gmft_spark.plans.rollup import refresh_rollup

        r = refresh_rollup(
            spark,
            args.table,
            args.rollup_table,
            keys=[k for k in args.rollup_keys.split(",") if k],
            sum_cols=[c for c in args.rollup_sums.split(",") if c],
        )
        state = "refreshed" if r["refreshed"] else "up to date"
        print(
            f"rollup: {state} through source snapshot "
            f"{r['source_snapshot_id']}"
        )
    if args.expire_keep:
        r = S.expire_snapshots(args.table, keep_last=args.expire_keep)
        print(
            f"expire: {r['expired_snapshots']} snapshots dropped, "
            f"{r['deleted_files']} files vacuumed"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Training-data curation job entrypoint: transcripts with HTML payloads
→ main-content extraction → scoring → fingerprint dedup → curated corpus
with lineage (and optionally an Iceberg-style snapshot commit).

Cluster deployment mirrors jobs/run_extraction.py:

    zip -r gmft_spark.zip gmft_spark
    spark-submit --master <cluster> --py-files gmft_spark.zip \\
        jobs/run_curation.py \\
        --input  s3://.../transcripts/  (parquet with conv_id, turn_idx, text) \\
        --output s3://.../curated/ \\
        --min-quality 0.3 --buckets 4096 --snapshot-table s3://.../corpus/

Every stage is an operator with its own driver oracle or tests
(operators/html_content.py, training_pipeline.py); this entrypoint wires
resume/lineage/snapshot plumbing around them the way a production
curation run deploys.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", default=None, help="transcript parquet dir")
    parser.add_argument(
        "--input-snapshot-table",
        default=None,
        help="read transcripts from a snapshot table (plans/snapshots.py); "
        "with --since-snapshot, curate only the appended delta",
    )
    parser.add_argument("--since-snapshot", type=int, default=None)
    parser.add_argument("--output", required=True, help="curated sink dir")
    parser.add_argument("--min-quality", type=float, default=0.3)
    parser.add_argument("--buckets", type=int, default=64)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--snapshot-table", default=None)
    parser.add_argument(
        "--snapshot-mode",
        choices=("append", "upsert"),
        default="append",
        help="with --snapshot-table: 'upsert' MERGEs on (conv_id, "
        "turn_idx) so re-curating the same turns replaces their prior "
        "rows (idempotent re-runs)",
    )
    parser.add_argument(
        "--snapshot-buckets",
        type=int,
        default=None,
        metavar="N",
        help="with --snapshot-table (append mode): bucket the committed "
        "files on conv_id (hidden bucket(N) partition transform) so "
        "point lookups read ~1/N of the table's files",
    )
    parser.add_argument(
        "--rollup-table",
        default=None,
        help="with --snapshot-table (append mode): after the corpus "
        "commit, incrementally refresh this per-conversation stats "
        "rollup (plans/rollup.py) from the corpus changelog",
    )
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)
    if args.snapshot_buckets and not (
        args.snapshot_table and args.snapshot_mode == "append"
    ):
        parser.error(
            "--snapshot-buckets needs --snapshot-table with "
            "--snapshot-mode append (the bucket transform tags appended "
            "files)"
        )
    if args.rollup_table and not (
        args.snapshot_table and args.snapshot_mode == "append"
    ):
        parser.error(
            "--rollup-table needs --snapshot-table with "
            "--snapshot-mode append (the rollup reads the append "
            "changelog; overwrite commits carry no delta)"
        )

    from pyspark.sql import SparkSession, functions as F

    builder = SparkSession.builder.appName("gmft-spark-curate")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from gmft_spark.operators.training_pipeline import curate
    from gmft_spark.plans.lineage import resume_filter, write_results_with_lineage

    if bool(args.input) == bool(args.input_snapshot_table):
        parser.error("exactly one of --input / --input-snapshot-table")
    if args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        from gmft_spark.plans.snapshots import incremental_scan, read_table

        if args.since_snapshot is not None:
            transcripts = incremental_scan(
                spark, args.input_snapshot_table, args.since_snapshot
            )
            if transcripts is None:
                print(
                    "nothing to do: no new input since snapshot "
                    f"{args.since_snapshot}"
                )
                return 0
        else:
            transcripts = read_table(spark, args.input_snapshot_table)
    if args.resume:
        transcripts = resume_filter(spark, transcripts, args.output, args.buckets)

    n_input = transcripts.count()
    if n_input == 0:
        print("nothing to do: all buckets completed")
        return 0

    run_id = args.run_id or f"curate-{int(time.time())}"
    curated = curate(transcripts, min_quality=args.min_quality).withColumn(
        "status", F.lit("ok")  # lineage sink's ok/error accounting column
    )
    lineage = write_results_with_lineage(
        spark, curated, args.output, n_buckets=args.buckets, run_id=run_id
    )
    stats = lineage.groupBy().sum("n_tables", "n_ok").collect()[0]
    print(
        f"run {run_id}: {n_input} turns in, {stats[0]} curated docs out "
        f"({stats[1]} ok)"
    )
    if args.snapshot_table:
        from gmft_spark.plans.snapshots import commit_append, commit_upsert

        batch = curated.withColumn("run_id", F.lit(run_id))
        if args.snapshot_mode == "upsert":
            sid = commit_upsert(
                spark, batch, args.snapshot_table,
                key_cols=["conv_id", "turn_idx"],
            )
        else:
            sid = commit_append(
                spark,
                batch,
                args.snapshot_table,
                bucket_by=(
                    ("conv_id", args.snapshot_buckets)
                    if args.snapshot_buckets
                    else None
                ),
            )
        print(
            f"snapshot {sid} committed to {args.snapshot_table} "
            f"({args.snapshot_mode})"
        )
        if args.rollup_table:
            from gmft_spark.plans.rollup import refresh_rollup

            r = refresh_rollup(
                spark,
                args.snapshot_table,
                args.rollup_table,
                keys=["conv_id"],
                sum_cols=["n_tokens", "n_tables"],
            )
            print(
                f"rollup {args.rollup_table} refreshed through source "
                f"snapshot {r['source_snapshot_id']}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Production job entrypoint: transcripts → extracted tables with lineage.

Cluster deployment (the north-rule contract):

    zip -r gmft_spark.zip gmft_spark
    spark-submit --master <cluster> --py-files gmft_spark.zip \\
        jobs/run_extraction.py \\
        --input  s3://.../transcripts/  (or a local parquet dir) \\
        --output s3://.../extracted/ \\
        --buckets 4096 --resume

Behavior:
  * reads the transcript table (Iceberg identifier or parquet path);
  * with ``--resume``, anti-filters conversation buckets already recorded
    in the output's lineage table so failed runs restart without
    recomputing finished partitions;
  * extraction runs as the shuffle-free mapInPandas pipeline;
  * results land partitioned by ``bucket(conv_id)`` plus per-bucket
    lineage rows (counts + ok/error tallies + run id).
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
        help="read the transcripts from a snapshot table instead of a raw "
        "parquet dir (plans/snapshots.py)",
    )
    parser.add_argument(
        "--since-snapshot",
        type=int,
        default=None,
        help="with --input-snapshot-table: process only rows appended "
        "AFTER this snapshot id (incremental run); without it, read HEAD",
    )
    parser.add_argument("--output", required=True, help="result sink dir")
    parser.add_argument("--buckets", type=int, default=64)
    parser.add_argument(
        "--formatter",
        choices=("tatr", "ditr", "histogram"),
        default="tatr",
        help="structure-recognition model family (reference: TATR neural "
        "structure, DITR divider model, non-deep histogram sweep)",
    )
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--snapshot-table",
        default=None,
        help="also commit results to a snapshot table (Iceberg-style "
        "commit log: time travel, incremental scans, atomic publish — "
        "plans/snapshots.py)",
    )
    parser.add_argument(
        "--snapshot-mode",
        choices=("append", "upsert"),
        default="append",
        help="with --snapshot-table: 'append' adds the batch as new rows "
        "(changelog-visible); 'upsert' MERGEs on (conv_id, turn_idx, "
        "table_id) so reprocessing the same turns REPLACES their prior "
        "rows (copy-on-write; idempotent re-runs)",
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
        help="with --snapshot-table (append mode): after the results "
        "commit, incrementally refresh this per-conversation stats "
        "rollup (plans/rollup.py) from the results changelog",
    )
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--master", default=None, help="override (else spark-submit's)")
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

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("gmft-spark-extract")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from gmft_spark.operators.extract import (
        extract_tables,
        extract_tables_ditr,
        extract_tables_histogram,
    )
    from gmft_spark.plans.lineage import resume_filter, write_results_with_lineage

    formatters = {
        "tatr": extract_tables,
        "ditr": extract_tables_ditr,
        "histogram": extract_tables_histogram,
    }

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

    run_id = args.run_id or f"run-{int(time.time())}"
    results = formatters[args.formatter](transcripts)
    lineage = write_results_with_lineage(
        spark, results, args.output, n_buckets=args.buckets, run_id=run_id
    )
    stats = lineage.groupBy().sum("n_tables", "n_ok", "n_error").collect()[0]
    print(
        f"run {run_id}: {n_input} turns in, "
        f"{stats[0]} tables out ({stats[1]} ok / {stats[2]} error)"
    )
    if args.snapshot_table:
        from pyspark.sql import functions as F

        from gmft_spark.plans.snapshots import commit_append, commit_upsert

        batch = results.withColumn("run_id", F.lit(run_id))
        if args.snapshot_mode == "upsert":
            sid = commit_upsert(
                spark,
                batch,
                args.snapshot_table,
                key_cols=["conv_id", "turn_idx", "table_id"],
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
                sum_cols=["n_rows"],
            )
            print(
                f"rollup {args.rollup_table} refreshed through source "
                f"snapshot {r['source_snapshot_id']}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())

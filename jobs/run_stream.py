"""Streaming extraction job: a file-source transcript stream drains
through the SAME stateless extraction operator as the batch job into a
snapshot table — one atomic snapshot per micro-batch, exactly-once via
the batch-id stamp, optionally keeping a stats rollup fresh per batch.

    zip -r gmft_spark.zip gmft_spark
    spark-submit --master <cluster> --py-files gmft_spark.zip \\
        jobs/run_stream.py --input s3://.../incoming/ \\
        --snapshot-table s3://.../results/ --checkpoint s3://.../ckpt/ \\
        [--rollup-table s3://.../stats/]

Run it on a schedule with ``availableNow`` (this entrypoint) or flip the
trigger for continuous operation; the checkpoint makes either shape
resume-exact. Downstream consumers read the table's changelog with
``snapshots.incremental_scan`` — streaming in, incremental batch out."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="transcript parquet dir (file stream source)")
    parser.add_argument("--snapshot-table", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument(
        "--rollup-table",
        default=None,
        help="refresh this per-conversation stats rollup after each "
        "micro-batch commit (plans/rollup.py)",
    )
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("gmft-spark-stream")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from gmft_spark.plans.snapshots import current_snapshot_id, read_table
    from gmft_spark.streaming.pipeline import (
        run_snapshot_sink,
        stream_extract,
        stream_transcripts,
    )

    run_snapshot_sink(
        stream_extract(stream_transcripts(spark, args.input)),
        args.snapshot_table,
        args.checkpoint,
        rollup_table=args.rollup_table,
        rollup_keys=["conv_id"] if args.rollup_table else None,
        rollup_sums=["n_rows"] if args.rollup_table else None,
    )
    head = current_snapshot_id(args.snapshot_table)
    if head is None:
        print("drained: no new input, no snapshot committed")
        return 0
    n = read_table(spark, args.snapshot_table).count()
    print(f"drained: snapshot head {head}, {n} rows live")
    return 0


if __name__ == "__main__":
    sys.exit(main())

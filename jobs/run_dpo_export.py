"""DPO preference-pair export job: raw agent transcripts → lint gate →
failure→recovery pair mining → leakage-safe split, written with
per-bucket lineage for checkpoint resume.

The trainer-side counterpart of jobs/run_sft_export.py: where SFT export
renders whole conversations, this job mines the label-free preference
pairs agent transcripts already contain — a tool call that FAILED
(``"ok":false`` in the tool turn's JSON payload) followed by one that
SUCCEEDED in the same conversation grades the two assistant turns that
issued them (convstats.dpo_pairs_frame's contract: shared ``prompt`` =
latest prior user turn, ``rejected``/``chosen`` = the two assistant
turns the environment graded).

Tool turns whose payload is not JSON (or carries no ``ok`` field) are
UNGRADEABLE: they mine as neither failure nor recovery, so dirty
payloads shrink the yield rather than fabricate pairs.

Cluster deployment mirrors jobs/run_sft_export.py:

    zip -r gmft_spark.zip gmft_spark
    spark-submit --master <cluster> --py-files gmft_spark.zip \\
        jobs/run_dpo_export.py \\
        --input  s3://.../transcripts/  (conv_id, turn_idx, role, text, tool, ts) \\
        --output s3://.../dpo/ --buckets 4096 [--resume]

Output under --output (lineage-tracked, bucket resume):
    pairs/results/bucket=N/    (conv_id, failed_turn_idx,
                               recovered_turn_idx, prompt, rejected,
                               chosen, split)
    pairs/_lineage/            per-bucket lineage (resume checkpoint)
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", default=None, help="transcript parquet dir")
    parser.add_argument(
        "--input-snapshot-table",
        default=None,
        help="read transcripts from a snapshot table (plans/snapshots.py); "
        "with --since-snapshot, mine only the appended delta",
    )
    parser.add_argument("--since-snapshot", type=int, default=None)
    parser.add_argument("--output", required=True)
    parser.add_argument("--buckets", type=int, default=64)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--keep-dirty",
        action="store_true",
        help="mine conversations that fail the protocol lint too",
    )
    parser.add_argument(
        "--snapshot-table",
        default=None,
        help="also commit the mined pairs to a snapshot table "
        "(plans/snapshots.py)",
    )
    parser.add_argument(
        "--snapshot-mode",
        choices=("append", "upsert"),
        default="append",
        help="with --snapshot-table: 'append' adds this run's pairs as "
        "new rows; 'upsert' MERGEs on (conv_id, failed_turn_idx) so "
        "re-exports stay idempotent at the table layer",
    )
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    builder = SparkSession.builder.appName("gmft-spark-dpo-export")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from gmft_spark.operators.convstats import (
        _split_col,
        dpo_pairs_frame,
        lint_frame,
    )
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

    pairs_out = os.path.join(args.output, "pairs")
    if args.resume:
        transcripts = resume_filter(
            spark, transcripts, pairs_out, args.buckets
        )
    n_input = transcripts.count()
    if n_input == 0:
        print("nothing to do: all buckets completed")
        return 0

    run_id = args.run_id or f"dpo-{int(time.time())}"

    # 1. protocol lint at conversation grain (real wall clocks — same
    # gate as the SFT export; preference pairs mined from structurally
    # corrupt conversations would grade the wrong turns)
    n_dirty = 0
    if not args.keep_dirty:
        lint = lint_frame(transcripts, jitter=False)
        dirty_cond = (F.col("n_ts_inversions") > 0) | (
            F.col("n_tool_wrong_role") > 0
        )
        # ONE pass for the count (see jobs/run_sft_export.py)
        n_dirty = lint.agg(
            F.count(F.when(dirty_cond, 1)).alias("n")
        ).collect()[0]["n"]
        clean = lint.filter(~dirty_cond).select("conv_id")
        transcripts = transcripts.join(clean, "conv_id", "left_semi")

    # 2. grade tool turns from their JSON payload: ok parses strictly
    # (get_json_object returns NULL on non-JSON / missing field →
    # ungradeable, mined as neither failure nor recovery)
    ok = F.when(
        F.col("role") == "tool",
        F.get_json_object(F.col("text"), "$.ok") == "true",
    )
    turns = transcripts.select("conv_id", "turn_idx", "role", "text", ok.alias("ok"))

    # 3. mine failure→recovery pairs; split rides the shared conv rule
    pairs = (
        dpo_pairs_frame(turns)
        .withColumn("split", _split_col())
        .withColumn("status", F.lit("ok"))
    )
    if pairs.isEmpty():
        # zero pairs is a legitimate outcome (no graded failures). The
        # lineage writer can't mark buckets complete without rows, so
        # pair-less buckets stay un-checkpointed: a --resume re-mines
        # them and deterministically re-yields zero — idempotent.
        print(
            f"run {run_id}: {n_input} turns in, {n_dirty} conversations "
            "dropped by lint, 0 preference pairs out"
        )
        return 0
    lineage = write_results_with_lineage(
        spark, pairs, pairs_out, n_buckets=args.buckets, run_id=run_id
    )
    # lineage re-aggregates the whole results dir — under --resume this
    # count includes pairs landed by earlier runs (cumulative, and
    # labeled so)
    stats = lineage.groupBy().sum("n_tables", "n_ok").collect()[0]
    n_pairs = stats[0] or 0
    print(
        f"run {run_id}: {n_input} turns in, {n_dirty} conversations "
        f"dropped by lint, {n_pairs} preference pairs in output "
        "(cumulative across resumed runs)"
    )
    if args.snapshot_table:
        from gmft_spark.plans.snapshots import commit_append, commit_upsert

        batch = pairs.drop("status").withColumn("run_id", F.lit(run_id))
        if args.snapshot_mode == "upsert":
            sid = commit_upsert(
                spark,
                batch,
                args.snapshot_table,
                key_cols=["conv_id", "failed_turn_idx"],
            )
        else:
            sid = commit_append(spark, batch, args.snapshot_table)
        print(
            f"snapshot {sid} committed to {args.snapshot_table} "
            f"({args.snapshot_mode})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

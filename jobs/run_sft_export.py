"""SFT training-data export job: raw agent transcripts → lint gate →
leakage-safe conversation split → tool-result folding → rendered
transcripts + loss-mask spans, written per split with per-partition
lineage for checkpoint resume.

This is the conversation-grain companion to jobs/run_curation.py: where
curation scores and dedups documents, this job turns the SURVIVING
transcripts into what a trainer actually consumes — one rendered string
per conversation (tokenized once) plus [start,end) character spans with
``loss_mask`` 1 on assistant turns (convstats.render_spans_frame's
contract). Every stage is an operator with its own driver oracle or
tests (operators/convstats.py); this entrypoint wires the plumbing.

Cluster deployment mirrors jobs/run_extraction.py:

    zip -r gmft_spark.zip gmft_spark
    spark-submit --master <cluster> --py-files gmft_spark.zip \\
        jobs/run_sft_export.py \\
        --input  s3://.../transcripts/  (conv_id, turn_idx, role, text, tool, ts) \\
        --output s3://.../sft/ --buckets 4096 [--no-fold] [--resume]

Outputs under --output:
    turns/results/bucket=N/    per-turn span rows (conv_id, turn_idx,
                               role, start_char, end_char, loss_mask,
                               split) — resume grain, lineage-tracked
    turns/_lineage/            per-bucket lineage (resume checkpoint)
    conversations/split=S/     one row per conversation: rendered text +
                               n_turns (what the tokenizer reads)
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
        "with --since-snapshot, export only the appended delta",
    )
    parser.add_argument("--since-snapshot", type=int, default=None)
    parser.add_argument("--output", required=True)
    parser.add_argument("--buckets", type=int, default=64)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--no-fold",
        action="store_true",
        help="skip tool-result folding (keep tool turns as their own rows)",
    )
    parser.add_argument(
        "--keep-dirty",
        action="store_true",
        help="export conversations that fail the protocol lint too "
        "(default: timestamp inversions / tool-name violations drop the "
        "whole conversation)",
    )
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    builder = SparkSession.builder.appName("gmft-spark-sft-export")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from gmft_spark.operators.convstats import (
        _split_col,
        fold_tool_turns_frame,
        lint_frame,
        render_conversations_frame,
        render_spans_frame,
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

    turns_out = os.path.join(args.output, "turns")
    if args.resume:
        transcripts = resume_filter(
            spark, transcripts, turns_out, args.buckets
        )
    n_input = transcripts.count()
    if n_input == 0:
        print("nothing to do: all buckets completed")
        return 0

    run_id = args.run_id or f"sft-{int(time.time())}"

    # 1. protocol lint at conversation grain (real wall clocks: no
    # jitter). The gate drops STRUCTURAL corruption — wall-clock
    # inversions and tool names on non-tool roles; a tool turn missing
    # its name still renders fine, so that stays a reported count, not a
    # disqualifier.
    n_dirty = 0
    if not args.keep_dirty:
        lint = lint_frame(transcripts, jitter=False)
        clean = lint.filter(
            (F.col("n_ts_inversions") == 0)
            & (F.col("n_tool_wrong_role") == 0)
        ).select("conv_id")
        n_dirty = lint.count() - clean.count()
        # conv_id-keyed left-semi: co-partitioned with everything below
        transcripts = transcripts.join(clean, "conv_id", "left_semi")
        if n_dirty and transcripts.isEmpty():
            print(
                f"nothing to export: lint dropped all {n_dirty} "
                "conversations (rerun with --keep-dirty to inspect)"
            )
            return 0

    # 2. leakage-safe split — a pure function of conv_id (no join)
    # 3. tool folding — tool output becomes evidence inside the anchor turn
    folded = (
        transcripts
        if args.no_fold
        else fold_tool_turns_frame(
            transcripts.select("conv_id", "turn_idx", "role", "text")
        )
    )
    folded = folded.withColumn("split", _split_col())

    # 4. loss-mask spans (per-turn resume grain, lineage-tracked)
    spans = render_spans_frame(folded).join(
        folded.select("conv_id", "turn_idx", "split"),
        ["conv_id", "turn_idx"],
    ).withColumn("status", F.lit("ok"))
    lineage = write_results_with_lineage(
        spark, spans, turns_out, n_buckets=args.buckets, run_id=run_id
    )
    stats = lineage.groupBy().sum("n_tables", "n_ok").collect()[0]

    # 5. rendered conversations, partitioned by split for the trainer
    rendered = render_conversations_frame(folded).withColumn(
        "split", _split_col()
    )
    rendered.write.mode("append").partitionBy("split").parquet(
        os.path.join(args.output, "conversations")
    )
    per_split = {
        r["split"]: r["n"]
        for r in rendered.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print(
        f"run {run_id}: {n_input} turns in, {n_dirty} conversations "
        f"dropped by lint, {stats[0]} span rows out ({stats[1]} ok), "
        f"conversations per split: "
        + ", ".join(f"{k}={per_split[k]}" for k in sorted(per_split))
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

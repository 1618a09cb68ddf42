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

Outputs under --output (BOTH lineage-tracked, resuming independently —
a crash between the two writes is recoverable with --resume, and each
path reprocesses only its own incomplete buckets):
    turns/results/bucket=N/            per-turn span rows (conv_id,
                                       turn_idx, role, start_char,
                                       end_char, loss_mask, split)
    turns/_lineage/                    per-bucket lineage (resume)
    conversations/results/bucket=N/    one row per conversation:
                                       rendered text + n_turns + split
                                       (what the tokenizer reads)
    conversations/_lineage/            per-bucket lineage (resume)
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
    parser.add_argument(
        "--snapshot-table",
        default=None,
        help="also commit the rendered conversations to a snapshot table "
        "(plans/snapshots.py) so table maintenance / time travel / "
        "incremental consumers apply to the export",
    )
    parser.add_argument(
        "--snapshot-mode",
        choices=("append", "upsert"),
        default="append",
        help="with --snapshot-table: 'append' adds this run's "
        "conversations as new rows; 'upsert' MERGEs on conv_id so "
        "re-exports stay idempotent at the table layer",
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
            delta = incremental_scan(
                spark, args.input_snapshot_table, args.since_snapshot
            )
            if delta is None:
                print(
                    "nothing to do: no new input since snapshot "
                    f"{args.since_snapshot}"
                )
                return 0
            # whole-conversation re-export: the delta is appended TURNS,
            # but this job's outputs are conversation-grain renders — a
            # conversation that gained turns since the snapshot must
            # re-render in FULL, or the delta fragment would export as a
            # truncated transcript with offsets restarting at 0 (and
            # under --snapshot-mode upsert silently REPLACE the complete
            # rendered row for that conv_id). conv_id-keyed left-semi
            # against the tiny distinct-delta set; only touched
            # conversations re-export.
            touched = delta.select("conv_id").distinct()
            transcripts = read_table(
                spark, args.input_snapshot_table
            ).join(touched, "conv_id", "left_semi")
        else:
            transcripts = read_table(spark, args.input_snapshot_table)

    turns_out = os.path.join(args.output, "turns")
    conv_out = os.path.join(args.output, "conversations")
    n_input = transcripts.count()
    if n_input == 0:
        print("nothing to do: empty input")
        return 0

    run_id = args.run_id or f"sft-{int(time.time())}"

    # 1. protocol lint at conversation grain (real wall clocks: no
    # jitter). The gate drops STRUCTURAL corruption — wall-clock
    # inversions and tool names on non-tool roles; a tool turn missing
    # its name still renders fine, so that stays a reported count, not a
    # disqualifier. Lint runs on the FULL input even under --resume: the
    # two outputs resume independently below, so their incomplete-bucket
    # sets differ, and lint is one cheap conv_id window either way.
    n_dirty = 0
    if not args.keep_dirty:
        lint = lint_frame(transcripts, jitter=False)
        dirty_cond = (F.col("n_ts_inversions") > 0) | (
            F.col("n_tool_wrong_role") > 0
        )
        # ONE pass for the count (counting lint and clean separately
        # re-runs the full per-turn window aggregation twice)
        n_dirty = lint.agg(
            F.count(F.when(dirty_cond, 1)).alias("n")
        ).collect()[0]["n"]
        clean = lint.filter(~dirty_cond).select("conv_id")
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
    # TWO sinks (span rows + rendered conversations) read this frame;
    # persisting it keeps the lint window + semi-join + fold from
    # recomputing per sink (spills to disk past executor memory)
    folded = folded.withColumn("split", _split_col()).persist()

    # 4. loss-mask spans (bucket resume grain, lineage-tracked). The
    # resume filter drops only WHOLE conversations, so the per-conv
    # offset windows below never see a partial conversation.
    spans_src = (
        resume_filter(spark, folded, turns_out, args.buckets)
        if args.resume
        else folded
    )
    # split is a pure function of conv_id — added directly, never joined
    # back to folded. Guard on the SPANS frame, not its source:
    # render_spans_frame drops NULL-text rows (and folding drops tool
    # rows), so a non-empty source can still yield zero span rows — the
    # lineage writer must not see an all-filtered batch (an empty
    # partitioned write crashes its own re-read, the hazard the DPO job's
    # zero-pair guard documents).
    spans = (
        render_spans_frame(spans_src)
        .withColumn("split", _split_col())
        .withColumn("status", F.lit("ok"))
    )
    n_span_rows = n_span_ok = 0
    wrote_spans = not spans.isEmpty()
    if wrote_spans:
        lineage = write_results_with_lineage(
            spark, spans, turns_out, n_buckets=args.buckets, run_id=run_id
        )
        # lineage re-aggregates the whole results dir, so under --resume
        # these counts include rows landed by earlier runs — printed as
        # cumulative below, not as this batch's output
        stats = lineage.groupBy().sum("n_tables", "n_ok").collect()[0]
        n_span_rows, n_span_ok = stats[0], stats[1]

    # 5. rendered conversations — a SECOND lineage-tracked output with
    # its own resume state, so a crash between the span write and this
    # one is recoverable: --resume reprocesses exactly the conversation
    # buckets that never landed here, even when every span bucket is done.
    rendered = render_conversations_frame(folded).withColumn(
        "split", _split_col()
    ).withColumn("status", F.lit("ok"))
    conv_src = (
        resume_filter(spark, rendered, conv_out, args.buckets)
        if args.resume
        else rendered
    )
    per_split = {}
    if not conv_src.isEmpty():
        write_results_with_lineage(
            spark, conv_src, conv_out, n_buckets=args.buckets, run_id=run_id
        )
        per_split = {
            r["split"]: r["n"]
            for r in conv_src.groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        if args.snapshot_table:
            from gmft_spark.plans.snapshots import commit_append, commit_upsert

            batch = conv_src.select(
                "conv_id", "split", "n_turns", "rendered"
            ).withColumn("run_id", F.lit(run_id))
            if args.snapshot_mode == "upsert":
                sid = commit_upsert(
                    spark, batch, args.snapshot_table, key_cols=["conv_id"]
                )
            else:
                sid = commit_append(spark, batch, args.snapshot_table)
            print(
                f"snapshot {sid} committed to {args.snapshot_table} "
                f"({args.snapshot_mode})"
            )
    elif not wrote_spans:
        print("nothing to do: all buckets completed")
        return 0

    print(
        f"run {run_id}: {n_input} turns in, {n_dirty} conversations "
        f"dropped by lint, {n_span_rows} span rows in output "
        f"({n_span_ok} ok; cumulative across resumed runs), "
        f"conversations per split: "
        + ", ".join(f"{k}={per_split[k]}" for k in sorted(per_split))
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

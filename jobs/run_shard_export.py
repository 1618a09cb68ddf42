"""Trainer-facing shard export: a curated corpus (the output of
jobs/run_web_pipeline.py, or any parquet with doc_id/shard/pos/text
columns) → one gzipped JSONL file per shard, rows in the
deterministic ``pos`` order the sharder assigned.

This is the last mile a pretraining loader consumes: line-delimited
JSON shards whose membership and internal order are pure functions of
doc_id (textstats.shard_training_corpus), so re-exports are
byte-stable and appended corpora never reorder existing shards.

Scale shape: one repartition on the shard key (hash partitioning, so a
task carries at most a few shards — each shard still lands as ONE
sorted file via partitionBy; at 10^12 docs the shard count, not the
doc count, sets the task count), rows sorted within the partition, JSON
serialized JVM-side (to_json over a struct — no Python in the plan),
gzip text sink.

    spark-submit --master <cluster> --py-files gmft_spark.zip \\
        jobs/run_shard_export.py \\
        --input s3://.../corpus/results --output s3://.../shards/
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--input", required=True, help="curated corpus parquet dir"
    )
    parser.add_argument("--output", required=True, help="shard sink dir")
    parser.add_argument(
        "--columns",
        default="doc_id,url,lang,n_tokens,text",
        help="comma-separated columns to carry into each JSON line "
        "(doc_id/shard/pos are always read; missing ones are skipped)",
    )
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    builder = SparkSession.builder.appName("gmft-spark-shard-export")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()

    corpus = spark.read.parquet(args.input)
    have = set(corpus.columns)
    need = {"doc_id", "shard", "pos"}
    missing = need - have
    if missing:
        parser.error(f"input lacks required columns: {sorted(missing)}")
    carry = [c for c in args.columns.split(",") if c and c in have]
    if "doc_id" not in carry:
        carry = ["doc_id"] + carry

    n_shards = corpus.agg(F.max("shard")).collect()[0][0]
    if n_shards is None:
        print("nothing to do: empty corpus")
        return 0
    line = F.to_json(F.struct(*[F.col(c) for c in carry]))
    (
        corpus.select("shard", "pos", line.alias("value"))
        .repartition(int(n_shards) + 1, "shard")
        .sortWithinPartitions("shard", "pos")
        .select("shard", "value")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", "gzip")
        .text(args.output)
    )
    stats = corpus.agg(
        F.count("*").alias("n"),
        F.countDistinct("shard").alias("s"),
        F.sum("n_tokens").alias("t") if "n_tokens" in have else F.lit(None).alias("t"),
    ).collect()[0]
    print(
        f"exported {stats['n']} documents into {stats['s']} jsonl.gz "
        f"shards ({stats['t']} tokens) at {args.output}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

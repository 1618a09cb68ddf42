"""Results sink with per-partition lineage and checkpoint/resume.

The production design is an Iceberg table with hidden ``bucket(conv_id)``
partitioning plus a lineage side-table; this sandbox has no Iceberg runtime
jar, so the same semantics are implemented over partitioned parquet
(documented fallback, SURVEY.md §7.4):

  * results are written partitioned by ``bucket = pmod(xxhash64(conv_id), N)``;
  * after each bucket's data lands, a lineage row
    ``(bucket, n_tables, n_ok, n_error, run_id)`` is appended;
  * a re-run anti-joins the input against completed lineage buckets, so a
    failed run resumes from checkpoint without recomputing finished
    partitions — idempotent at bucket granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_BUCKETS = 64


def with_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Stable conv_id bucketing — the parquet stand-in for Iceberg's hidden
    ``bucket(conv_id)`` partition transform."""
    return df.withColumn("bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)))


def completed_buckets(spark: SparkSession, out_dir: str) -> set:
    lineage_path = os.path.join(out_dir, "_lineage")
    if not os.path.exists(lineage_path):
        return set()
    rows = spark.read.parquet(lineage_path).select("bucket").distinct().collect()
    return {r["bucket"] for r in rows}


def write_results_with_lineage(
    spark: SparkSession,
    results: DataFrame,
    out_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    run_id: str = "run-0",
) -> DataFrame:
    """Write extraction results partitioned by conv bucket + lineage rows.
    Returns the lineage DataFrame for inspection.

    Scale note: results are repartitioned BY BUCKET before the
    partitionBy write, so each bucket directory receives ONE file per
    run instead of one per upstream task (an un-repartitioned
    partitionBy fans out to tasks x buckets small files — measured
    4,096 files for a 16-task/256-bucket run, and the file-metadata
    overhead flattened the 4-to-16-core e2e scaling). The shuffle
    moves only the compact RESULT rows, never the extraction input."""
    bucketed = with_bucket(results, n_buckets).repartition(
        n_buckets, F.col("bucket")
    )
    bucketed.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(out_dir, "results")
    )
    landed = with_bucket(
        # re-read what actually landed so lineage reflects the sink, not the plan
        spark.read.parquet(os.path.join(out_dir, "results")),
        n_buckets,
    )
    aggs = [
        F.count("*").alias("n_tables"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_ok"),
        F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("n_error"),
        F.lit(run_id).alias("run_id"),
    ]
    # extraction metrics per partition (north-rule: lineage carries the
    # outlier/quality channel, not just counts)
    if "n_rows" in landed.columns:
        aggs.append(F.sum("n_rows").alias("total_rows"))
    if "outliers" in landed.columns:
        aggs.extend(
            [
                F.sum(
                    F.when(
                        F.map_contains_key(F.col("outliers"), "skipped text"), 1
                    ).otherwise(0)
                ).alias("n_with_skipped_text"),
                F.min(
                    F.element_at(F.col("outliers"), "lowest iob").cast("double")
                ).alias("min_lowest_iob"),
                F.sum(
                    F.when(
                        F.map_contains_key(F.col("outliers"), "nms removed rows"),
                        1,
                    ).otherwise(0)
                ).alias("n_with_nms_removals"),
            ]
        )
    lineage = landed.groupBy("bucket").agg(*aggs)
    lineage.write.mode("overwrite").parquet(os.path.join(out_dir, "_lineage"))
    # hand back the WRITTEN table: downstream aggregations (run stats,
    # resume probes) read the tiny lineage parquet instead of
    # re-scanning every landed result file a second time
    return spark.read.parquet(os.path.join(out_dir, "_lineage"))


def resume_filter(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Drop turns whose conv bucket already completed — checkpoint resume
    without recompute. The bucket-id set is tiny (≤ n_buckets), so the
    filter is a broadcast-able IN-list, not a join."""
    done = completed_buckets(spark, out_dir)
    bucketed = with_bucket(transcripts, n_buckets)
    if not done:
        return bucketed
    return bucketed.filter(~F.col("bucket").isin(*[int(b) for b in done]))

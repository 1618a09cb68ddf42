"""Bucketed tables for co-located joins.

At 100 TB the transcripts table and its derived results should be written
bucketed on ``conv_id`` so conversation-level joins (results ⋈ transcripts,
results ⋈ lineage, incremental merges) are exchange-free: both sides hash
into the same bucket layout at write time, and Spark's bucketed scan joins
bucket-to-bucket with no shuffle. This is the executable stand-in for
Iceberg's hidden ``bucket(conv_id)`` partition transform (no Iceberg
runtime jar in this environment — see plans/lineage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    n_buckets: int = 16,
    bucket_col: str = "conv_id",
    sort_col: str = "turn_idx",
) -> None:
    """Persist as a bucketed+sorted managed table (saveAsTable is required
    — plain parquet paths can't carry bucket metadata)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str = "conv_id"
) -> DataFrame:
    """Join two identically-bucketed tables — with matching bucket specs
    the planner emits a SortMergeJoin with NO Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on)

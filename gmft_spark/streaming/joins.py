"""Watermarked stream-stream join: click→view attribution as a streaming
query.

The batch as-of/range joins (operators/analytics.py) answer "which views
preceded this click" over data at rest; this is the same question asked
continuously. Structured Streaming requires the time-range predicate so
it can bound the join state: with both sides watermarked, a buffered view
row is dropped from state as soon as the watermark passes click_ts_max −
window — state stays O(window · rate), never O(stream).

Scale notes: the join is keyed on user_id (state shards by key across
executors); the watermark is the knob that trades late-data tolerance for
state size. Rows later than the watermark are dropped — the same
exactly-once append contract the windowed aggregations pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

JOIN_WINDOW_S = 3600  # views within this window before a click attribute
# (1 h, matching analytics.funnel_stages — the sf events tables span 30
# days, so sub-minute windows never fire at test scale)


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)


def click_view_attribution(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Every (click, view) pair for the same user where the view happened
    within JOIN_WINDOW_S seconds before the click (1 h). Works identically on a
    batch frame (for differential tests) and a streaming one."""
    wm = events.withWatermark("ts", watermark) if events.isStreaming else events
    views = wm.filter(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    clicks = wm.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return clicks.join(
        views,
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_S} SECONDS")
        ),
    ).select("click_id", "view_id", "user_id", "click_ts", "view_ts")

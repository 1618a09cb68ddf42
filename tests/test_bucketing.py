"""Bucketed co-located joins: identical bucket specs ⇒ exchange-free join."""

from pyspark.sql import functions as F

from gmft_spark.operators.extract import extract_tables
from gmft_spark.plans.bucketing import bucketed_join, write_bucketed
from gmft_spark.sources.transcripts import synthesize_transcripts


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    t = synthesize_transcripts(spark, n_convs=8, turns_per_conv=4)
    results = extract_tables(t).select(
        "conv_id", "turn_idx", "table_id", "status", "n_rows"
    )
    write_bucketed(t, "t_transcripts", n_buckets=8)
    write_bucketed(results, "t_results", n_buckets=8)

    # disable auto-broadcast so the planner must use the bucket layout
    # (at real scale neither side fits a broadcast anyway)
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_results", "t_transcripts")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucket-aligned scans: no shuffle on either join side
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() > 0

        # correctness: equals the plain join
        plain = results.join(t, "conv_id").count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

    spark.sql("DROP TABLE IF EXISTS t_transcripts")
    spark.sql("DROP TABLE IF EXISTS t_results")


def test_bucketed_aggregation_no_exchange(spark, tmp_path):
    t = synthesize_transcripts(spark, n_convs=6, turns_per_conv=4)
    write_bucketed(t, "t_conv", n_buckets=4)
    agg = spark.table("t_conv").groupBy("conv_id").agg(
        F.count("*").alias("n_turns")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # grouping on the bucket key reuses the write-time layout
    assert "Exchange" not in plan, plan
    assert agg.count() == 6
    spark.sql("DROP TABLE IF EXISTS t_conv")

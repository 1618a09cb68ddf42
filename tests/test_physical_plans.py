"""Physical-plan assertions: the optimizations the engine claims must be
visible in the executed plans (scale behaviour is a correctness property
here, not an afterthought)."""

from pyspark.sql import functions as F

from gmft_spark.operators.analytics import revenue_by_nation
from gmft_spark.operators.extract import extract_tables
from gmft_spark.operators.relational import f7_cell_assignment, h1_sweep_gaps
from gmft_spark.sources.transcripts import transcripts_from_documents

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_extraction_is_narrow_map_with_pruned_scan(spark):
    t = transcripts_from_documents(spark, SF)
    plan = _plan(extract_tables(t))
    assert "Exchange" not in plan  # no shuffle anywhere in the stage
    read = [l for l in plan.split("\n") if "ReadSchema" in l][0]
    # only the key-deriving columns reach the parquet scan
    assert "doc_id" in read and "source" in read
    assert "text" not in read  # the wide column is pruned


def test_dimension_joins_broadcast(spark):
    plan = _plan(revenue_by_nation(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_f7_bands_broadcast_and_aggregates_partial(spark):
    plan = _plan(f7_cell_assignment(spark, SF))
    # interval theta-joins against tiny band tables go broadcast
    assert plan.count("BroadcastNestedLoopJoin") == 2
    # argmax runs as partial HashAggregate (map-side combine), not a window
    assert "HashAggregate" in plan
    assert "partial_min" in plan or "partial" in plan.lower()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(h1_sweep_gaps(spark, SF))
    pushed = [l for l in plan.split("\n") if "PushedFilters" in l]
    assert pushed, "expected a parquet scan with PushedFilters"
    assert any("IsNotNull" in l or "l_orderkey" in l for l in pushed)


def test_lineitem_filter_prunes_columns(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_orderkey") % 997 == 0).select("l_quantity")
    read = [l for l in _plan(q).split("\n") if "ReadSchema" in l][0]
    assert "l_quantity" in read and "l_extendedprice" not in read

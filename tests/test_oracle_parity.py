"""Driver-gate replica: every registered query must match its DuckDB
oracle on the testdata tables (sf0.001 for speed; the driver runs sf0.01)."""

import os

import pytest

import __spark_entry__ as E
from tests.oracle_check import duck_connection, compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


def _oracle_names():
    return sorted(E.oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, duck, name):
    fn = E.queries()[name]
    ok, msg = compare(fn(spark, SF_DIR), duck, E.oracle_sql()[name])
    assert ok, f"{name}: {msg}"


def test_pipeline_queries_run(spark):
    qs = E.queries()
    for name in ("tatr_extract_pipeline", "histogram_extract_pipeline"):
        df = qs[name](spark, SF_DIR)
        rows = df.limit(5).collect()
        assert rows and rows[0]["csv"] is not None


def _pipeline_names():
    from gmft_spark.entry import PIPELINE_QUERIES

    return sorted(PIPELINE_QUERIES)


@pytest.mark.parametrize("name", _pipeline_names())
def test_pipeline_query_driver_canon(spark, name):
    """Mirror of the driver's canonicalizer on every registered pipeline
    query: collect to pandas, sort_values over all columns, factorize —
    this is exactly where round 1 died on array/map cells. Every output
    column must be scalar (complex ones JSON-serialized by _scalarize)."""
    df = E.queries()[name](spark, SF_DIR)
    for f in df.schema.fields:
        assert f.dataType.typeName() in (
            "string",
            "integer",
            "long",
            "double",
            "float",
            "boolean",
            "timestamp",
            "date",
        ), f"{name}.{f.name} is non-scalar: {f.dataType}"
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    canon = pdf[cols].sort_values(cols)  # raises on unhashable cells
    assert len(canon) == len(pdf)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0

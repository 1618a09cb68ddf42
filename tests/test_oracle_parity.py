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


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0

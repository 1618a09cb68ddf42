import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from gmft_spark.plans.session import build_session

    warehouse = tempfile.mkdtemp(prefix="gmft-spark-warehouse-")
    s = build_session(
        master="local[4]",
        shuffle_partitions=4,
        app_name="gmft-spark-tests",
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield s
    s.stop()

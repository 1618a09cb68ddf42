import pytest


@pytest.fixture(scope="session")
def spark():
    from gmft_spark.plans.session import build_session

    s = build_session(master="local[4]", shuffle_partitions=4, app_name="gmft-spark-tests")
    yield s
    s.stop()

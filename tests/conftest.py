import pytest

from demv_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("demv-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: end-to-end replication tests with MLlib fits"
    )

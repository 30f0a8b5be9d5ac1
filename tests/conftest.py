import os
import shutil

import pytest

from demv_spark.session import get_spark


def drop_table_and_dir(spark, name: str) -> None:
    """DROP TABLE IF EXISTS plus warehouse-directory removal. A run
    killed mid-stream leaves the table DIRECTORY on disk while the
    next process's fresh derby metastore has never heard of the table
    — DROP TABLE IF EXISTS is then a no-op and the next saveAsTable
    fails with 'location already exists'. Every fixture that
    saveAsTable's should clean through here."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).replace("file:", "")
    shutil.rmtree(os.path.join(wh, name.lower()), ignore_errors=True)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("demv-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: end-to-end replication tests with MLlib fits"
    )

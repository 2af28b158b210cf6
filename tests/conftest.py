import pytest


@pytest.fixture(scope="session")
def spark():
    from blabel_spark.spark_util import get_spark
    s = get_spark("blabel-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()

import pytest

from riskloc_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("riskloc-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"

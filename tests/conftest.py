import os

import pytest

os.environ.setdefault("PRASE_DRIVER_MEM", "6g")


@pytest.fixture(scope="session")
def spark():
    from prase_spark.config import get_spark

    s = get_spark("prase_spark_tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()

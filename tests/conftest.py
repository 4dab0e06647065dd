import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from outliertree_spark.session import get_spark
    s = get_spark(app="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

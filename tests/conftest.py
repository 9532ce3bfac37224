import pytest


@pytest.fixture(scope="session")
def spark():
    from rtfproc_spark.session import get_spark

    s = get_spark("rtfproc-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()

import pytest


def pytest_collection_modifyitems(items):
    # test_rocksdb_state_store_provider stops the process-wide SparkContext
    # (the RocksDB provider is a session conf, so it builds its own session);
    # any spark test collected after it would find a dead context — run it
    # last. Stable sort keeps the original order for everything else.
    items.sort(key=lambda it: it.name == "test_rocksdb_state_store_provider")


@pytest.fixture(scope="session")
def spark():
    from rtfproc_spark.session import get_spark

    s = get_spark("rtfproc-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()

import pytest

from bluegraph_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="bluegraph-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    yield s

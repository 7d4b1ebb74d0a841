import pytest

from bluegraph_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    # ANSI ON in tests, deliberately stricter than the engine default: the
    # driver's correctness gate runs an ANSI session, and round 1 shipped an
    # overflow (sum of xxhash64) that only an ANSI session could surface.
    s = get_session(
        app_name="bluegraph-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={"spark.sql.ansi.enabled": "true"},
    )
    yield s

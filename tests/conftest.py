import pytest

from beetle_search_engine_spark.sources.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("beetle-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()

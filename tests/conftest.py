import pytest

from ps_projekt_pagerank_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ps-pagerank-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()

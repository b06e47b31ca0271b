import pytest


@pytest.fixture(scope="session")
def spark():
    from origami_spark.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()

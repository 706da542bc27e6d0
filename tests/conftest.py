import pytest

from graph_data_science_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gds-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()

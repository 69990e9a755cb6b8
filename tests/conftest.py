import pytest

from dbt_customer360_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()

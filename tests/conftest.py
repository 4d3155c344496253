import pytest

from graphforge_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[4]",
        app_name="graphforge-tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g", "spark.sql.warehouse.dir": "/tmp/gf-warehouse"},
    )
    yield s
    s.stop()

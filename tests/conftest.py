import pytest

from name_matching_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="nms-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.sql.warehouse.dir": "/tmp/nms-warehouse"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s

import os

import pytest

from rheoceros_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_session(
        app_name="rheoceros_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={"spark.driver.memory": "8g", "spark.ui.enabled": "false"},
    )


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phaser_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="phaser_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmpwd(tmp_path):
    return str(tmp_path)

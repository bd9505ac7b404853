import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))  # for oracle_rendler imports

from rendler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("local[8]", app_name="rendler_tests", shuffle_partitions=8)
    yield s
    s.stop()

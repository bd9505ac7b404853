import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))  # for oracle_rendler imports

from rendler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # tests measure correctness, not first-query latency: skip the
    # session-level engine warmup (rendler_spark.session._warm_engine)
    os.environ.setdefault("SPARK_GRAFT_WARMUP", "0")
    s = get_spark("local[8]", app_name="rendler_tests", shuffle_partitions=8)
    yield s
    s.stop()

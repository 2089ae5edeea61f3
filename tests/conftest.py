import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logfowd2_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # small local session for unit tests; scale knobs exercised in bench
    s = build_session(
        app_name="logfowd2_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from docext_spark.session import get_spark
    s = get_spark(app_name="docext_spark_tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()

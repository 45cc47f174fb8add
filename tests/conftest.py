from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from quichash_spark.session import get_spark

    s = get_spark("local[8]", shuffle_partitions=16, app_name="quichash_tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_clips(spark):
    """200-clip corpus, materialized once per session."""
    from quichash_spark.fixtures import materialized_clips

    return materialized_clips(spark, 200)

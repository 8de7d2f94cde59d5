from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bingo2sql_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bingo2sql_spark-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_events(spark):
    """Shared deterministic event stream: 200 keys x 8 versions = 1600
    events, schema evolution at the midpoint, zipf repos."""
    from bingo2sql_spark.sources.synth import generate_events

    df = generate_events(spark, n_keys=200, versions_per_key=8, n_repos=20, seed=42)
    df = df.cache()
    df.count()
    return df

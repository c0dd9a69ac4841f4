"""Shared Spark session for the test suite (one JVM for all tests)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from walmart_project_etl_spark.session import get_spark

    s = get_spark("wpe-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s

from __future__ import annotations

import os

import pytest

from cardano_analytics_duckdb_spark.plans import get_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_session(app_name="tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("TEST_SF_DIR", SF_SMOKE)

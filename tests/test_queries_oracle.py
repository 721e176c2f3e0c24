"""Every declared query hash-matches its DuckDB oracle (the t2 gate, run
locally at sf0.001 for speed; the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from cardano_analytics_duckdb_spark.operators import all_oracles, all_queries

from .oracle import compare, duck_connection

QUERIES = all_queries()
ORACLES = all_oracles()


# Every query now carries a SQL oracle — the fixpoint operators check their
# RESULT via recursive-CTE closure (graph.py, dedup.py) and the sketch query
# via error-bound booleans (analytic.py); reference-impl tests
# (test_graph.py, test_properties.py) stay as additional guards.
NO_ORACLE_DECLARED: set[str] = set()


def test_every_query_has_an_oracle():
    missing = set(QUERIES) - set(ORACLES) - NO_ORACLE_DECLARED
    assert not missing, f"queries without oracle SQL: {missing}"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(set(QUERIES) - NO_ORACLE_DECLARED))
def test_oracle_match(spark, sf_dir, duck, name):
    df = QUERIES[name](spark, sf_dir)
    compare(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_is_driver_canonicalizable(spark, sf_dir, name):
    """Driver-canonicalizer gate, enforced at the SCHEMA level.

    The driver's compare harness pandas-sorts every output column (arrays
    crash it: unhashable list cells) and collects timestamps through the
    session timezone (rendering differs from DuckDB's naive rendering).
    Arrays must ship as '|'-joined sorted strings, timestamps as
    unix_millis epochs — for every registered query, not just the ones
    currently inside the driver's check window.
    """
    from pyspark.sql import types as T

    schema = QUERIES[name](spark, sf_dir).schema
    for field in schema.fields:
        assert not isinstance(
            field.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), f"{name}.{field.name}: nested type {field.dataType} crashes the driver canonicalizer"
        # timestamp_ntz is fine (naive on both engines, driver-proven in
        # r01); session-TZ-bearing TIMESTAMP is the one that diverges.
        assert not isinstance(
            field.dataType, (T.TimestampType, T.DateType)
        ), f"{name}.{field.name}: {field.dataType} renders session-timezone-dependently; emit unix_millis"


def test_register_views(spark, sf_dir):
    """S3: one temp view per table, queryable via spark.sql."""
    from cardano_analytics_duckdb_spark.lake.tables import (
        TESTDATA_TABLES,
        register_views,
    )

    register_views(spark, sf_dir, suffix="_view")
    for t in TESTDATA_TABLES:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}_view").first()["n"] > 0
        spark.catalog.dropTempView(f"{t}_view")

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-join + set-comparison query on
sf0.001.  ``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 plus the LLM-pipeline extensions, each paired with
DuckDB-runnable oracle SQL producing identical column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cardano_analytics_duckdb_spark.lake.fixtures import ensure_fixture_lake
from cardano_analytics_duckdb_spark.operators import all_oracles, all_queries

# The cardano_* oracle SQL reads the fixture lake's files directly, and the
# driver may run oracle SQL before the Spark query — materialize the lake at
# import (pure PyArrow, deterministic, marker-guarded; ~100 ms once).
ensure_fixture_lake()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cardano_analytics_duckdb_spark.operators.relational import (
        cross_nation_orders,
    )

    return cross_nation_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (tables pre-registered as views)."""
    return all_oracles()

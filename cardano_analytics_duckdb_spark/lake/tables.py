"""Readers for the driver's synthetic parquet tables and view registration.

Mirrors the reference's view-catalog pattern — one SQL view per table over a
discovered parquet file set (``_setup_views``,
/root/reference/token_fee_analysis.py:49-81) — as Spark temp views.  Unlike
the reference's glob-everything approach, `spark.read.parquet` keeps filter
and projection pushdown into the scan (SURVEY §4 R1/R4 are free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        raise FileNotFoundError(f"table {name!r} not found at {path}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects ([PARQUET_TYPE_ILLEGAL]).  Read nanos as long and
        # truncate to microseconds — exactly DuckDB's ns→us cast semantics,
        # so oracle comparisons stay bit-identical.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register one temp view per table (``{name}{suffix}``), like the
    reference's ``{t}_view`` catalog (token_fee_analysis.py:76-80)."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}{suffix}")

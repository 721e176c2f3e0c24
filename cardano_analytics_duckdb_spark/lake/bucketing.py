"""Bucketed tables: co-located joins without shuffles.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders) is
shuffling both sides by the key.  Writing both tables bucketed by that key
into the same bucket count makes the partitioning a *stored* property:
Spark's bucketed scan reports the right distribution, Catalyst drops the
Exchange on both sides, and the join runs shuffle-free forever after —
the write-once-shuffle, read-many-times-free trade.

Bucketed output requires the table catalog (``saveAsTable``); the warehouse
lives under the lake root.  ``tests/test_plans.py`` proves the Exchange
elision on the physical plan.

This module is the WRITE PRIMITIVE; the lifecycle layer that makes
bucketed layouts declarative, persisted, signature-fresh, and
automatically resolved by the default read path is ``lake/layout.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table


def write_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    name: str | None = None,
) -> str:
    """Materialize ``table`` bucketed (and sorted) by ``bucket_cols``.

    Returns the catalog table name.  One shuffle now; none on any future
    join or aggregation keyed by ``bucket_cols``.
    """
    name = name or f"{table}_by_{'_'.join(bucket_cols)}"
    df = load_table(spark, sf_dir, table)
    return write_bucketed_df(df, name, bucket_cols, n_buckets)


def write_bucketed_df(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
) -> str:
    """Materialize an arbitrary DataFrame bucketed (and sorted) by
    ``bucket_cols`` — the primitive behind :func:`write_bucketed`, exposed
    for sources that aren't testdata tables (scaled probes, derived
    frames).

    The pre-write ``repartition(n_buckets, cols)`` matters: bucketBy makes
    EVERY writer task emit one file per bucket it holds rows for, so an
    N-partition input yields up to N x n_buckets files — tiny files AND a
    scan whose per-bucket sortedness Spark can't trust (multi-file buckets
    need a merge).  Hash-repartitioning on the bucket columns first gives
    exactly one file per bucket: fewer files, and the stored sort order
    survives to elide the join's Sort as well as its Exchange."""
    (
        df.repartition(n_buckets, *[df[c] for c in bucket_cols])
        .write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(name)
    )
    return name


def bucketed_join(
    spark: SparkSession, left_name: str, right_name: str, on: list[str]
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key."""
    return spark.table(left_name).join(spark.table(right_name), on=on)

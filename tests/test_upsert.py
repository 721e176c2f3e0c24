"""Partition-scoped MERGE: replaced keys vanish, inserts land, and files of
untouched partitions are byte-for-byte left alone (the partition-atomicity
contract that makes upsert safe on a plain-parquet lake)."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F  # noqa: F401

from cardano_analytics_duckdb_spark.lake.upsert import upsert_partitioned


def _rows(spark, path):
    return sorted(
        map(tuple, spark.read.parquet(path).select("k", "v", "slot_group").collect())
    )


def test_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    root = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 100), (4, "d", 200)],
        "k long, v string, slot_group long",
    )
    base.write.partitionBy("slot_group").parquet(os.path.join(root, "t"))
    untouched = sorted(glob.glob(os.path.join(root, "t", "slot_group=200", "*.parquet")))
    mtimes = [os.path.getmtime(f) for f in untouched]

    updates = spark.createDataFrame(
        [(2, "B2", 0), (5, "e", 0), (6, "f", 300)],
        "k long, v string, slot_group long",
    )
    stats = upsert_partitioned(
        spark, root, "t", updates, key_cols=["k"], partition_col="slot_group"
    )
    assert stats == {"replaced": 1, "inserted": 2, "partitions": 2}

    got = _rows(spark, os.path.join(root, "t"))
    assert got == sorted(
        [
            (1, "a", 0),
            (2, "B2", 0),  # replaced in place
            (3, "c", 100),  # untouched partition
            (4, "d", 200),  # untouched partition
            (5, "e", 0),  # insert into existing partition
            (6, "f", 300),  # insert creating a new partition
        ]
    )
    # untouched partition's files were not rewritten
    assert [
        os.path.getmtime(f)
        for f in sorted(glob.glob(os.path.join(root, "t", "slot_group=200", "*.parquet")))
    ] == mtimes


def test_upsert_is_idempotent(spark, tmp_path):
    root = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 100)], "k long, v string, slot_group long"
    )
    base.write.partitionBy("slot_group").parquet(os.path.join(root, "t"))
    updates = spark.createDataFrame(
        [(1, "A", 0)], "k long, v string, slot_group long"
    )
    upsert_partitioned(spark, root, "t", updates, ["k"])
    first = _rows(spark, os.path.join(root, "t"))
    stats = upsert_partitioned(spark, root, "t", updates, ["k"])
    assert stats["replaced"] == 1 and stats["inserted"] == 0
    assert _rows(spark, os.path.join(root, "t")) == first


def test_upsert_rejects_duplicate_keys_in_batch(spark, tmp_path):
    """Duplicate keys within one updates batch would all be written and
    silently corrupt the table — the merge must refuse instead."""
    import pytest

    root = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 0)], "k long, v string, slot_group long"
    )
    base.write.partitionBy("slot_group").parquet(os.path.join(root, "t"))
    dup_updates = spark.createDataFrame(
        [(1, "A", 0), (1, "B", 0)], "k long, v string, slot_group long"
    )
    with pytest.raises(ValueError, match="duplicate key"):
        upsert_partitioned(spark, root, "t", dup_updates, ["k"])

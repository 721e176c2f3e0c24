"""Partition-scoped MERGE: replaced keys vanish, inserts land, and files of
untouched partitions are byte-for-byte left alone.  Since r8 the merge
commits through the generation pointer (one atomic flip across every
touched partition), so readers resolve via ``generations.read_table`` and
the merge is correct on already-compacted (pointered) tables too."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F  # noqa: F401

from cardano_analytics_duckdb_spark.lake.upsert import upsert_partitioned


def _rows(spark, path):
    from cardano_analytics_duckdb_spark.lake.generations import read_table

    return sorted(
        map(tuple, read_table(spark, path).select("k", "v", "slot_group").collect())
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


def test_upsert_correct_on_generation_managed_table(spark, tmp_path):
    """The r8 motivation: on a table compaction has already pointered, the
    merge must fold the generation data (a raw-read merge would see
    superseded files, miss generation dirs, and leave replaced rows alive
    as duplicates)."""
    from cardano_analytics_duckdb_spark.lake.generations import (
        current_generations,
        read_table,
    )
    from cardano_analytics_duckdb_spark.lake.fsutil import LakeFs

    root = str(tmp_path)
    t = os.path.join(root, "t")
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 100)],
        "k long, v string, slot_group long",
    )
    # fragmented appends, then compaction -> generation-managed table
    for chunk in [base.filter("k = 1"), base.filter("k > 1")]:
        chunk.coalesce(1).write.mode("append").partitionBy(
            "slot_group"
        ).parquet(t)
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        _compact_lake_locked,
    )
    from cardano_analytics_duckdb_spark.lake.lock import maintenance_lock

    with maintenance_lock(spark, root, owner="test-compact"):
        _compact_lake_locked(spark, root, tables=["t"])
    lfs = LakeFs(spark, t)
    assert current_generations(lfs, t)  # pointered now

    updates = spark.createDataFrame(
        [(2, "B2", 0), (9, "i", 100)], "k long, v string, slot_group long"
    )
    stats = upsert_partitioned(spark, root, "t", updates, ["k"])
    assert stats == {"replaced": 1, "inserted": 1, "partitions": 2}
    assert _rows(spark, t) == sorted(
        [(1, "a", 0), (2, "B2", 0), (3, "c", 100), (9, "i", 100)]
    )
    # no duplicate keys survived anywhere (the silent-corruption mode)
    df = read_table(spark, t)
    assert df.count() == df.select("k").distinct().count()


def test_upsert_swap_is_atomic_for_readers(spark, tmp_path):
    """vacuum="defer": a reader resolving during/after the merge sees the
    whole pre- or post-merge table; superseded files remain until an
    explicit vacuum, which changes nothing visible."""
    from cardano_analytics_duckdb_spark.lake.generations import (
        read_table,
        superseded_paths,
        vacuum_superseded,
    )
    from cardano_analytics_duckdb_spark.lake.fsutil import LakeFs

    root = str(tmp_path)
    t = os.path.join(root, "t")
    spark.createDataFrame(
        [(1, "a", 0), (2, "b", 100)], "k long, v string, slot_group long"
    ).write.partitionBy("slot_group").parquet(t)
    updates = spark.createDataFrame(
        [(1, "A", 0), (3, "c", 100)], "k long, v string, slot_group long"
    )
    upsert_partitioned(spark, root, "t", updates, ["k"], vacuum="defer")
    after = sorted([(1, "A", 0), (2, "b", 100), (3, "c", 100)])
    assert _rows(spark, t) == after
    # old files still on disk for in-flight readers; vacuum is pure reclaim
    assert superseded_paths(LakeFs(spark, t), t)
    vacuum_superseded(spark, t)
    assert superseded_paths(LakeFs(spark, t), t) == []
    assert _rows(spark, t) == after


def test_upsert_int_updates_mix_with_compacted_generations(spark, tmp_path):
    """Generation files from DIFFERENT writers land in one explicit-file
    read, so their parquet footers must agree on the partition column's
    physical type.  An int32-typed updates batch must not produce int32
    generation files next to compaction's int64 ones — every generation
    writer canonicalizes integral partition columns to LONG."""
    from cardano_analytics_duckdb_spark.lake.lock import maintenance_lock
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        _compact_lake_locked,
    )

    root = str(tmp_path)
    t = os.path.join(root, "t")
    spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 100)],
        "k long, v string, slot_group long",
    ).write.partitionBy("slot_group").parquet(t)
    # compact first: partition 0 and 100 get int64 generation files
    with maintenance_lock(spark, root, owner="test"):
        _compact_lake_locked(spark, root, tables=["t"], vacuum="end")
    # upsert with an INT-typed partition column, touching ONLY partition 0
    # — partition 100 keeps its compaction-written (int64) generation, so
    # the final read mixes generation files from both writers
    updates = spark.createDataFrame(
        [(2, "B", 0), (4, "d", 0)], "k long, v string, slot_group int"
    )
    upsert_partitioned(spark, root, "t", updates, ["k"])
    got = _rows(spark, t)
    assert got == sorted([(1, "a", 0), (2, "B", 0), (3, "c", 100), (4, "d", 0)])
    # the partition column stays LONG through the mixed-writer read
    assert dict(read_tbl(spark, t).dtypes)["slot_group"] == "bigint"


def read_tbl(spark, path):
    from cardano_analytics_duckdb_spark.lake.generations import read_table

    return read_table(spark, path)

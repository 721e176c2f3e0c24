"""Partition-scoped MERGE (upsert) on a plain-parquet lake.

The lakehouse maintenance primitive between append and full rewrite:
replace-or-insert rows by key, rewriting ONLY the partitions the update
batch touches.  Spark's dynamic partition-overwrite does the heavy
lifting — one job stages the merged partitions and commits them atomically
per partition directory, leaving every untouched partition's files alone
(asserted by mtime in ``tests/test_upsert.py``).  A Delta/Iceberg sink
turns this into a transactional ``MERGE INTO``; the plan shape (anti-join
existing ⋈ update keys, union the updates) is identical.

Scale posture: the anti-join streams only the AFFECTED partitions of the
fact table against the (small) distinct-key side; cost is proportional to
the partitions touched, never the lake.  The one driver-side action is the
distinct partition-value collect — bounded by the batch's partition
fan-out, which a sane updater keeps small.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitioned(
    spark: SparkSession,
    root: str,
    table: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str = "slot_group",
) -> dict[str, int]:
    """Merge ``updates`` (full-row schema including ``partition_col``) into
    ``root/table`` by ``key_cols``.  Returns counters
    ``{"replaced": n, "inserted": n, "partitions": n}``."""
    path = os.path.join(root, table)
    parts = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    existing = spark.read.parquet(path).filter(
        F.col(partition_col).isin(parts)
    )
    keys = updates.select(*key_cols).distinct()
    survivors = existing.join(keys, key_cols, "left_anti")
    n_existing = existing.count()
    n_survivors = survivors.count()
    n_updates = updates.count()

    # localCheckpoint truncates the lineage so the write no longer reads
    # the path it is about to overwrite (Spark rejects self-overwrite
    # plans); materialized state is bounded by the touched partitions.
    merged = survivors.unionByName(updates).localCheckpoint()
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return {
        "replaced": n_existing - n_survivors,
        "inserted": n_updates - (n_existing - n_survivors),
        "partitions": len(parts),
    }

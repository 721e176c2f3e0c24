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
    ``{"replaced": n, "inserted": n, "partitions": n}``.

    Correctness contract (violations would silently corrupt the table, so
    the cheap one is asserted and the structural one documented):

    - ``updates`` must be unique per key — duplicate keys in one batch
      would all be written, leaving duplicate keys in the table.  Raises
      ``ValueError`` (one count on the already-materialized batch).
    - ``key_cols`` must deterministically fix ``partition_col``: the
      anti-join only scans the partitions the update batch touches, so if
      a key's partition value changed between versions, the stale row in
      the untouched partition would survive.  This is the same constraint
      Hive-style dynamic partition overwrite itself imposes, and cannot be
      checked without scanning the whole lake — by design this primitive
      never does.
    """
    path = os.path.join(root, table)
    # One aggregation pass for both counts (count vs count_distinct over a
    # key struct) — two separate .count() actions would materialize the
    # updates lineage twice more before the merge job runs it a third time.
    counts = updates.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.struct(*key_cols)).alias("k"),
    ).first()
    n_updates_total, n_distinct_keys = counts["n"], counts["k"]
    if n_distinct_keys != n_updates_total:
        raise ValueError(
            f"updates batch has {n_updates_total - n_distinct_keys} duplicate"
            f" key(s) over {key_cols}; upsert requires one row per key"
        )
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
    n_updates = n_updates_total

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

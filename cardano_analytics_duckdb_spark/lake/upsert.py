"""Partition-scoped MERGE (upsert) on a plain-parquet lake.

The lakehouse maintenance primitive between append and full rewrite:
replace-or-insert rows by key, rewriting ONLY the partitions the update
batch touches.  Since r8 the rewrite goes through the generation-pointer
layer (``lake/generations.py``): each touched partition's merged rows land
in a hidden generation dir and every touched partition commits in ONE
atomic pointer flip — a concurrent reader resolving via
``generations.read_table`` sees the pre- or post-merge state of the whole
table, never a half-merged one (strictly stronger than Spark's dynamic
partition overwrite, which is only per-directory atomic and deletes old
files mid-commit).  It is also the only read/write discipline that is
correct once compaction or rollback has already pointered the table —
a raw ``spark.read.parquet`` there sees superseded files and misses
generation dirs.  A Delta/Iceberg sink turns this into a transactional
``MERGE INTO``; the plan shape (anti-join existing ⋈ update keys, union
the updates) is identical.

Scale posture: the anti-join streams only the AFFECTED partitions of the
fact table against the (small) distinct-key side; cost is proportional to
the partitions touched, never the lake.  Driver-side actions are the
distinct partition-value collect and one write job per touched partition —
both bounded by the batch's partition fan-out, which a sane updater keeps
small.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .fsutil import LakeFs
from .generations import (
    commit_swaps,
    current_generations,
    generation_files,
    live_partition_files,
    next_generation_dir,
    vacuum_superseded,
)
from .lock import maintenance_lock


def _partition_source(
    spark: SparkSession,
    lfs: LakeFs,
    table_dir: str,
    entry: str,
    gens: dict,
    partition_col: str,
) -> tuple[DataFrame | None, list[str]]:
    """(current rows of the partition WITHOUT the partition column, live
    hive file URIs).  Generation files carry the column in the data (drop
    it); hive files carry it in the path (explicit-file reads never see
    it).  The merge writer re-injects it uniformly."""
    st = gens.get(entry) or {}
    live = live_partition_files(lfs, table_dir, entry, gens)
    branches = []
    if st.get("gen"):
        gfiles = generation_files(lfs, table_dir, st["gen"])
        if gfiles:
            branches.append(spark.read.parquet(*gfiles).drop(partition_col))
    if live:
        branches.append(spark.read.parquet(*live))
    if not branches:
        return None, live
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out, live


def upsert_partitioned(
    spark: SparkSession,
    root: str,
    table: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str = "slot_group",
    vacuum: str = "end",
    allow_stale_materializations: bool = False,
) -> dict[str, int]:
    """Merge ``updates`` (full-row schema including ``partition_col``) into
    ``root/table`` by ``key_cols``.  Returns counters
    ``{"replaced": n, "inserted": n, "partitions": n}``.

    Holds the lake's ``_maintenance.lock`` (like compaction/rollback) so
    two maintenance jobs can never interleave pointer flips.
    ``vacuum="end"`` (default) reclaims the superseded files before
    returning; ``vacuum="defer"`` leaves them for in-flight readers and an
    explicit ``vacuum_superseded`` later.

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

    Maintained aggregates (``streaming/materialize.py``) fold source files
    exactly once — they can never observe a row-CHANGING rewrite like this
    one.  ENFORCED since r8: a table with a registered materialization
    marker refuses the upsert unless ``allow_stale_materializations=True``
    (the caller's statement that the aggregates will be recomputed in
    batch) or the marker is removed via ``deregister_materialization``.
    """
    path = os.path.join(root, table)
    from ..streaming.materialize import require_no_materializations

    require_no_materializations(
        spark, path, "upsert_partitioned", allow_stale_materializations
    )
    # One aggregation pass for both counts (count vs count_distinct over a
    # key struct) — two separate .count() actions would materialize the
    # updates lineage twice more before the merge jobs run it again.
    counts = updates.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.struct(*key_cols)).alias("k"),
    ).first()
    n_updates, n_distinct_keys = counts["n"], counts["k"]
    if n_distinct_keys != n_updates:
        raise ValueError(
            f"updates batch has {n_updates - n_distinct_keys} duplicate"
            f" key(s) over {key_cols}; upsert requires one row per key"
        )
    parts = sorted(
        r[0] for r in updates.select(partition_col).distinct().collect()
    )
    if any(p is None for p in parts):
        raise ValueError(f"NULL {partition_col} in updates is not supported")
    gate_err: RuntimeError | None = None
    result: dict[str, int] = {}
    with maintenance_lock(
        spark, root, owner=f"upsert_partitioned({table})"
    ):
        # Re-check inside the lock: a materialization registered in the
        # preflight->lock window must not bypass the divergence gate
        # (registration takes no lock, so only an in-lock check makes the
        # gate atomic with the rewrite).  A refusal touched nothing, so it
        # exits the with-body normally — keep-on-raise lock forensics are
        # for failed rewrites — and re-raises after release.
        try:
            require_no_materializations(
                spark, path, "upsert_partitioned",
                allow_stale_materializations,
            )
        except RuntimeError as e:
            gate_err = e
        if gate_err is None:
            result = _upsert_locked(
                spark, path, updates, key_cols, partition_col, parts,
                n_updates, vacuum,
            )
    if gate_err is not None:
        raise gate_err
    return result


def _upsert_locked(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    parts: list,
    n_updates: int,
    vacuum: str,
) -> dict[str, int]:
    lfs = LakeFs(spark, path)
    gens = current_generations(lfs, path)
    keys = updates.select(*key_cols).distinct()
    swaps: dict[str, dict] = {}
    replaced = 0
    for p in parts:
        entry = f"{partition_col}={p}"
        existing, live = _partition_source(
            spark, lfs, path, entry, gens, partition_col
        )
        updates_p = updates.filter(F.col(partition_col) == F.lit(p)).drop(
            partition_col
        )
        if existing is None:
            merged = updates_p  # brand-new partition: inserts only
        else:
            survivors = existing.join(
                F.broadcast(keys), key_cols, "left_anti"
            )
            replaced += existing.count() - survivors.count()
            merged = survivors.unionByName(updates_p)
        gen = next_generation_dir(lfs, path, entry)
        # The write never reads the dir it replaces (generation dirs are
        # fresh names), so no self-overwrite lineage break is needed.
        # EVERY generation writer (here, compaction, rollback) injects an
        # integral partition column as LONG: generation files from
        # different writers end up in one explicit-file read, where
        # parquet footers must agree — an int32 file from one writer next
        # to an int64 file from another fails the whole table read.
        # Entry naming uses the plain str() rendering — exact for the
        # integral partition values this lake uses (Hive-escaped string
        # values are out of scope).
        ptype = updates.schema[partition_col].dataType
        if isinstance(
            ptype, (T.ByteType, T.ShortType, T.IntegerType)
        ):
            ptype = T.LongType()
        merged.withColumn(partition_col, F.lit(p).cast(ptype)).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, gen))
        st = gens.get(entry) or {}
        swaps[entry] = {
            "gen": gen,
            "superseded": st.get("superseded", [])
            + [f.rsplit("/", 1)[-1] for f in live],
        }
    # ONE pointer flip commits every touched partition together
    commit_swaps(lfs, path, swaps)
    if vacuum == "end":
        vacuum_superseded(spark, path)
    return {
        "replaced": replaced,
        "inserted": n_updates - replaced,
        "partitions": len(parts),
    }

"""Orphan report + cleanup (lake/vacuum.py): crash leftovers are found,
removal runs under the maintenance lock, committed data is untouched."""

from __future__ import annotations

import os

import pytest

from cardano_analytics_duckdb_spark.lake.fixtures import fixture_blocks
from cardano_analytics_duckdb_spark.lake.lock import LOCK_NAME, maintenance_lock
from cardano_analytics_duckdb_spark.lake.vacuum import find_orphans, vacuum_lake
from cardano_analytics_duckdb_spark.streaming.ingest import ingest_blocks


def _plant_orphans(dest):
    part = os.path.join(dest, "tx", "_rollback__slot_group_0")
    os.makedirs(part)
    # junk part-file: must be INVISIBLE to table reads (the "_" prefix)
    open(os.path.join(part, "part-0.parquet"), "w").write("junk")
    table_tmp = os.path.join(dest, "_compacting__utxo")
    os.makedirs(table_tmp)
    os.makedirs(os.path.join(dest, "_epochs"), exist_ok=True)
    open(os.path.join(dest, "_epochs", "000005.snapshot.json.tmp"), "w").write(
        '{"trunc'
    )
    return ["_compacting__utxo", "tx/_rollback__slot_group_0"], [
        "_epochs/000005.snapshot.json.tmp"
    ]


def test_vacuum_reports_and_removes_orphans(spark, tmp_path):
    dest = str(tmp_path / "lake")
    ingest_blocks(spark, fixture_blocks()[:3], dest, batch_size=3)
    exp_dirs, exp_files = _plant_orphans(dest)

    report = find_orphans(spark, dest)
    assert report["tmp_dirs"] == sorted(exp_dirs)
    assert report["tmp_files"] == exp_files
    # find_orphans is read-only
    assert os.path.isdir(os.path.join(dest, "_compacting__utxo"))

    # the planted junk parquet must NOT poison table reads: "_"-prefixed
    # tmp dirs are invisible to Hadoop readers (this is why the rewrite
    # jobs name them that way)
    n_tx = spark.read.parquet(os.path.join(dest, "tx")).count()
    removed = vacuum_lake(spark, dest)
    # vacuum additionally reclaims superseded generation data (none here —
    # this lake was never compacted/rolled back through generations)
    assert removed == {**report, "superseded": []}
    assert find_orphans(spark, dest) == {"tmp_dirs": [], "tmp_files": []}
    # committed data untouched, lock released
    assert spark.read.parquet(os.path.join(dest, "tx")).count() == n_tx
    assert not os.path.exists(os.path.join(dest, LOCK_NAME))


def test_vacuum_refuses_while_lock_held(spark, tmp_path):
    """A held lock means a live job's tmp dir may be mid-swap (or a
    crashed job awaits inspection) — vacuum must refuse, not delete."""
    dest = str(tmp_path / "lake")
    ingest_blocks(spark, fixture_blocks()[:3], dest, batch_size=3)
    _plant_orphans(dest)
    with maintenance_lock(spark, dest, owner="live-compact"):
        with pytest.raises(RuntimeError, match="live-compact"):
            vacuum_lake(spark, dest)
        # nothing was deleted
        assert os.path.isdir(os.path.join(dest, "_compacting__utxo"))

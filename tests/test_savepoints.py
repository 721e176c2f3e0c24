"""Lake-level savepoints: cross-table consistent time travel (r10).

Per-table pointers flip independently; a savepoint taken under the
maintenance lock pins every table's version in one cut, so reading it
back can never mix pre- and post-maintenance states of different tables.
"""

from __future__ import annotations

import os

import pytest

from cardano_analytics_duckdb_spark.lake.fixtures import fixture_blocks
from cardano_analytics_duckdb_spark.lake.fsutil import LakeFs
from cardano_analytics_duckdb_spark.lake.generations import (
    read_table,
    vacuum_superseded,
)
from cardano_analytics_duckdb_spark.lake.lock import maintenance_lock
from cardano_analytics_duckdb_spark.lake.savepoints import (
    create_savepoint,
    drop_savepoint,
    read_savepoint,
    savepoint_info,
)
from cardano_analytics_duckdb_spark.streaming.ingest import (
    compact_lake,
    ingest_blocks,
)


@pytest.fixture()
def lake(spark, tmp_path):
    dest = str(tmp_path / "lake")
    ingest_blocks(spark, fixture_blocks()[:8], dest, batch_size=1)
    return dest


def _counts(dfs) -> dict[str, int]:
    return {t: df.count() for t, df in dfs.items()}


def test_savepoint_roundtrip_across_maintenance(spark, lake):
    """sp1 (pre-append, pre-compaction) reads back the ORIGINAL state of
    every table after appends + compaction moved the head; sp2 reads the
    new head.  The cut is lake-wide: sp1's counts match the live counts
    recorded when it was taken, table for table."""
    live_before = {
        t: read_table(spark, os.path.join(lake, t)).count()
        for t in ("tx", "utxo", "asset")
    }
    sp1 = create_savepoint(spark, lake)
    ingest_blocks(spark, fixture_blocks()[8:12], lake, batch_size=1)
    compact_lake(spark, lake, vacuum="defer")
    sp2 = create_savepoint(spark, lake)
    live_after = {
        t: read_table(spark, os.path.join(lake, t)).count()
        for t in ("tx", "utxo", "asset")
    }
    assert live_after["tx"] > live_before["tx"]

    at1 = _counts(read_savepoint(spark, lake, sp1))
    at2 = _counts(read_savepoint(spark, lake, sp2))
    for t, n in live_before.items():
        assert at1[t] == n, f"sp1 {t}"
    for t, n in live_after.items():
        assert at2[t] == n, f"sp2 {t}"
    # the savepoint covers every NON-EMPTY data table in the lake (the
    # fixture's first 8 blocks populate 4 of the 5 created table dirs;
    # empty `datum` is omitted — no schema to pin, same contract as the
    # live read_table's empty-table refusal)
    info = savepoint_info(LakeFs(spark, lake), lake, sp1)
    assert set(info) == {"tx", "utxo", "asset", "mint"}


def test_savepoint_respects_maintenance_lock(spark, lake):
    """A savepoint refuses while maintenance holds the lake lock (and
    therefore can never capture a torn multi-table swap)."""
    with maintenance_lock(spark, lake, owner="test-holder"):
        with pytest.raises(RuntimeError, match="locked by another"):
            create_savepoint(spark, lake)
    # lock released -> works again
    assert create_savepoint(spark, lake) >= 1


def test_savepoint_cli_roundtrip(spark, lake, capsys):
    """savepoint --create / (list) / --show all emit machine-readable
    JSON and agree with the library."""
    import json

    from cardano_analytics_duckdb_spark.cli import main

    assert main(["savepoint", "--lake", lake, "--create"], spark=spark) == 0
    created = json.loads(capsys.readouterr().out.strip())
    sp = created["created"]
    assert set(created["tables"]) == {"tx", "utxo", "asset", "mint"}

    assert main(["savepoint", "--lake", lake], spark=spark) == 0
    assert sp in json.loads(capsys.readouterr().out.strip())["savepoints"]

    assert (
        main(["savepoint", "--lake", lake, "--show", str(sp)], spark=spark)
        == 0
    )
    shown = json.loads(capsys.readouterr().out.strip())
    assert shown["tables"] == created["tables"]


def test_savepoint_fails_loud_after_unpinned_table_vacuum(spark, lake):
    """With retention OFF, vacuuming a member table reclaims the snapshot
    a savepoint pins: reading the savepoint raises for that table instead
    of silently returning a partial lake; unknown ids are loud too."""
    sp1 = create_savepoint(spark, lake)
    ingest_blocks(spark, fixture_blocks()[8:12], lake, batch_size=1)
    compact_lake(spark, lake, vacuum="defer")
    vacuum_superseded(spark, os.path.join(lake, "tx"), keep_savepoints=False)
    with pytest.raises(ValueError, match="vacuum"):
        read_savepoint(spark, lake, sp1)
    with pytest.raises(ValueError, match="available are"):
        read_savepoint(spark, lake, 999)


def test_vacuum_retention_preserves_pinned_savepoint(spark, lake):
    """Default vacuum keeps every path a live savepoint references — the
    savepoint's full read path survives — while still reclaiming
    unpinned superseded data; dropping the savepoint releases the pin and
    the next vacuum reclaims the rest."""
    before = {
        t: read_table(spark, os.path.join(lake, t)).count()
        for t in ("tx", "utxo", "asset")
    }
    sp1 = create_savepoint(spark, lake)
    ingest_blocks(spark, fixture_blocks()[8:12], lake, batch_size=1)
    compact_lake(spark, lake, vacuum="defer")

    reclaimed = vacuum_superseded(spark, os.path.join(lake, "tx"))
    # the savepoint reads back its exact cut after the vacuum...
    at1 = _counts(read_savepoint(spark, lake, sp1))
    for t, n in before.items():
        assert at1[t] == n, f"pinned {t} changed under vacuum"
    # ...and the live read is unaffected
    assert read_table(spark, os.path.join(lake, "tx")).count() > before["tx"]

    # the pin is not a no-op vacuum: dropping it frees strictly more
    drop_savepoint(spark, lake, sp1)
    reclaimed_after = vacuum_superseded(spark, os.path.join(lake, "tx"))
    assert reclaimed_after, "post-drop vacuum reclaimed nothing"
    assert not any(p in reclaimed for p in reclaimed_after)
    with pytest.raises(ValueError, match="available|vacuum"):
        read_savepoint(spark, lake, sp1)


def test_drop_savepoint_unknown_is_loud(spark, lake):
    with pytest.raises(ValueError, match="no savepoint"):
        drop_savepoint(spark, lake, 999)


def test_history_and_incremental_cli(spark, lake, capsys):
    """`history` lists travel-able versions with append/rewrite deltas;
    `query --changes-since` runs the report over only the appended rows."""
    import json

    from cardano_analytics_duckdb_spark.cli import main
    from cardano_analytics_duckdb_spark.lake.fsutil import LakeFs
    from cardano_analytics_duckdb_spark.lake.generations import (
        snapshot_versions,
    )

    create_savepoint(spark, lake)
    lfs = LakeFs(spark, lake)
    v1 = snapshot_versions(lfs, os.path.join(lake, "tx"))[-1]
    ingest_blocks(spark, fixture_blocks()[8:12], lake, batch_size=1)
    create_savepoint(spark, lake)

    assert main(["history", "--lake", lake, "--table", "tx"], spark=spark) == 0
    hist = json.loads(capsys.readouterr().out.strip())["tx"]
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[1]["appended_files"] > 0
    assert hist[1]["rewritten_entries"] == []
    assert all(h["published_ms"] for h in hist)

    assert (
        main(
            ["query", "--lake", lake, "--changes-since", str(v1)],
            spark=spark,
        )
        == 0
    )
    out = capsys.readouterr().out
    assert f"appended between v{v1} and v2" in out
    assert "Summary: n=" in out

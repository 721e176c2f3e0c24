"""Extraction parity: replaying fixture blocks through the ingestion
pipeline must reproduce the fixture lake tables exactly (same rows, same
values), and compaction must preserve them while reducing file count."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cardano_analytics_duckdb_spark.lake.fixtures import (
    ensure_fixture_lake,
    fixture_blocks,
)
from cardano_analytics_duckdb_spark.streaming.ingest import (
    LAKE_TABLES,
    compact_lake,
    ingest_blocks,
)


def _canon_rows(df):
    def c(v):
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        if isinstance(v, list):
            return tuple(c(x) for x in v)
        if hasattr(v, "asDict"):
            return tuple((k, c(x)) for k, x in sorted(v.asDict().items()))
        return v

    cols = sorted(c for c in df.columns if c != "slot_group")
    rows = [tuple(c(r[col]) for col in cols) for r in df.collect()]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("ingested_lake"))
    stats = ingest_blocks(
        spark, fixture_blocks(), dest, batch_size=25
    )
    return dest, stats


def test_ingest_stats(ingested):
    _, stats = ingested
    assert stats["transactions"] == 198
    assert stats["rollbacks"] == 0
    assert stats["batches"] >= 2  # actually micro-batched


def test_extraction_parity_all_tables(spark, ingested):
    dest, _ = ingested
    root = ensure_fixture_lake(spark)
    for t in LAKE_TABLES:
        expected = _canon_rows(spark.read.parquet(f"{root}/{t}"))
        actual = _canon_rows(spark.read.parquet(f"{dest}/{t}"))
        assert actual == expected, f"table {t} diverges after ingestion"


def test_ref_script_flag_derived_from_output_script(spark, ingested):
    # ogmios_parquet.py:278 derives has_ref_script from output.get('script');
    # the fixture carries exactly one reference-script output (tx 196).  Pin
    # a non-zero true count so the flag can't regress to constant-false on
    # both sides of the parity test at once.
    dest, _ = ingested
    trues = (
        spark.read.parquet(f"{dest}/utxo")
        .filter(F.col("has_ref_script"))
        .count()
    )
    assert trues == 1


def test_rollback_events_are_skipped(spark, tmp_path):
    dest = str(tmp_path / "lake_rb")
    blocks = fixture_blocks()[:3]
    blocks.insert(2, {"direction": "backward", "slot": 100_000})
    stats = ingest_blocks(spark, blocks, dest, batch_size=10)
    assert stats["rollbacks"] == 1
    assert stats["blocks"] == 3


def test_stop_slot_bounds_ingestion(spark, tmp_path):
    dest = str(tmp_path / "lake_stop")
    stats = ingest_blocks(
        spark, fixture_blocks(), dest, batch_size=500, stop_slot=150_000
    )
    max_slot = (
        spark.read.parquet(f"{dest}/tx").agg(F.max("slot")).first()[0]
    )
    assert max_slot <= 150_000
    assert stats["blocks"] < len(fixture_blocks())


def test_compaction_preserves_rows_and_merges_files(spark, ingested):
    from cardano_analytics_duckdb_spark.lake.fsutil import LakeFs
    from cardano_analytics_duckdb_spark.lake.generations import (
        partition_entries,
        read_table,
    )

    dest, _ = ingested
    before = _canon_rows(spark.read.parquet(f"{dest}/tx"))
    n_files_before = len(glob.glob(f"{dest}/tx/slot_group=*/*.parquet"))
    compact_lake(spark, dest)
    # Compacted data lives in generation dirs now — readers resolve the
    # pointer via read_table (a raw table-dir read no longer sees it).
    after = _canon_rows(read_table(spark, f"{dest}/tx"))
    n_files_after = len(glob.glob(f"{dest}/tx/_gen__*/*.parquet"))
    assert after == before
    lfs = LakeFs(spark, dest)
    n_groups = len(partition_entries(lfs, f"{dest}/tx"))
    assert n_files_after == n_groups  # exactly one file per partition
    assert n_files_after < n_files_before
    # default vacuum="end" reclaimed every superseded hive file
    assert glob.glob(f"{dest}/tx/slot_group=*/*.parquet") == []


def test_streaming_ingestion_matches_batch(spark, tmp_path):
    """The foreachBatch streaming path reproduces the fixture lake exactly
    (same extraction graph, streaming execution)."""
    import json

    from cardano_analytics_duckdb_spark.streaming.ingest import (
        ingest_blocks_streaming,
    )

    src = tmp_path / "blocks_json"
    src.mkdir()
    blocks = fixture_blocks()
    # two files -> at least one micro-batch boundary is possible
    for i, chunk in enumerate([blocks[: len(blocks) // 2], blocks[len(blocks) // 2:]]):
        with open(src / f"blocks_{i}.jsonl", "w") as f:
            for b in chunk:
                f.write(json.dumps(b) + "\n")
    dest = str(tmp_path / "streamed_lake")
    ingest_blocks_streaming(spark, str(src), dest)
    root = ensure_fixture_lake(spark)
    for t in LAKE_TABLES:
        expected = _canon_rows(spark.read.parquet(f"{root}/{t}"))
        actual = _canon_rows(spark.read.parquet(f"{dest}/{t}"))
        assert actual == expected, f"table {t} diverges via streaming path"


def test_rollback_lake_reconciles(spark, tmp_path):
    """T6 upgrade: rollback drops exactly the rows past the rollback point,
    leaving earlier partitions untouched."""
    from cardano_analytics_duckdb_spark.streaming.ingest import rollback_lake

    dest = str(tmp_path / "lake_rollback")
    ingest_blocks(spark, fixture_blocks(), dest, batch_size=500)
    tx = spark.read.parquet(f"{dest}/tx")
    to_slot = 150_000
    expect_keep = tx.filter(F.col("slot") <= to_slot).count()
    expect_drop = tx.count() - expect_keep
    dropped = rollback_lake(spark, dest, to_slot)
    assert dropped["tx"] == expect_drop
    from cardano_analytics_duckdb_spark.lake.generations import read_table

    after = read_table(spark, f"{dest}/tx")
    assert after.count() == expect_keep
    assert after.agg(F.max("slot")).first()[0] <= to_slot
    # boundary-straddling partition group 0 was rewritten, not dropped
    assert after.filter(F.col("slot_group") == 0).count() > 0


def test_streaming_ingestion_resumes_from_checkpoint(spark, tmp_path):
    """Fault-tolerance contract: re-running the stream against the SAME
    checkpoint ingests only files the checkpoint has not seen — already-
    processed input is never re-appended (no duplicates), new input is
    picked up exactly once.  This is the property that lets a production
    ingester crash/restart without reconciliation."""
    import json

    from cardano_analytics_duckdb_spark.streaming.ingest import (
        ingest_blocks_streaming,
    )

    src = tmp_path / "blocks_json"
    src.mkdir()
    blocks = fixture_blocks()
    half = len(blocks) // 2
    with open(src / "blocks_0.jsonl", "w") as f:
        for b in blocks[:half]:
            f.write(json.dumps(b) + "\n")
    dest = str(tmp_path / "resumable_lake")

    ingest_blocks_streaming(spark, str(src), dest)
    first = _canon_rows(spark.read.parquet(f"{dest}/tx"))

    # "Restart" with no new input: the checkpoint must make this a no-op.
    ingest_blocks_streaming(spark, str(src), dest)
    assert _canon_rows(spark.read.parquet(f"{dest}/tx")) == first

    # New file arrives; the restarted stream ingests ONLY the delta.
    with open(src / "blocks_1.jsonl", "w") as f:
        for b in blocks[half:]:
            f.write(json.dumps(b) + "\n")
    ingest_blocks_streaming(spark, str(src), dest)

    root = ensure_fixture_lake(spark)
    expected = _canon_rows(spark.read.parquet(f"{root}/tx"))
    assert _canon_rows(spark.read.parquet(f"{dest}/tx")) == expected


def test_streaming_ingestion_quarantines_corrupt_lines(spark, tmp_path):
    """A malformed feed line must never kill the stream: good blocks ingest
    normally, the poison line lands in dest/_quarantine verbatim."""
    import json

    from cardano_analytics_duckdb_spark.streaming.ingest import (
        ingest_blocks_streaming,
    )

    src = tmp_path / "blocks_json"
    src.mkdir()
    blocks = fixture_blocks()
    poison = '{"slot": 12, "transactions": [BROKEN'
    with open(src / "blocks_0.jsonl", "w") as f:
        for b in blocks:
            f.write(json.dumps(b) + "\n")
        f.write(poison + "\n")
    dest = str(tmp_path / "quarantine_lake")
    ingest_blocks_streaming(spark, str(src), dest)

    root = ensure_fixture_lake(spark)
    for t in ("tx", "utxo"):
        expected = _canon_rows(spark.read.parquet(f"{root}/{t}"))
        actual = _canon_rows(spark.read.parquet(f"{dest}/{t}"))
        assert actual == expected, f"table {t} diverges with poison line"
    q = spark.read.parquet(f"{dest}/_quarantine").collect()
    assert len(q) == 1 and q[0]["raw"] == poison


def test_quarantine_epoch_replay_does_not_duplicate(spark, tmp_path):
    """foreachBatch is at-least-once: simulate an epoch replay (checkpoint
    lost after the quarantine write committed) — the re-delivered epoch
    must REPLACE its epoch partition, not append the poison line again."""
    import json
    import shutil

    from cardano_analytics_duckdb_spark.streaming.ingest import (
        ingest_blocks_streaming,
    )

    src = tmp_path / "blocks_json"
    src.mkdir()
    poison = '{"slot": 12, "transactions": [BROKEN'
    with open(src / "blocks_0.jsonl", "w") as f:
        for b in fixture_blocks()[:3]:
            f.write(json.dumps(b) + "\n")
        f.write(poison + "\n")
    dest = str(tmp_path / "replay_lake")
    ingest_blocks_streaming(spark, str(src), dest)
    shutil.rmtree(os.path.join(dest, "_checkpoint"))
    ingest_blocks_streaming(spark, str(src), dest)

    q = spark.read.parquet(f"{dest}/_quarantine").collect()
    assert len(q) == 1 and q[0]["raw"] == poison


def test_streaming_epoch_replay_does_not_duplicate_table_rows(spark, tmp_path):
    """Crash between the table appends and the checkpoint commit: the
    replayed epoch must roll back the previous attempt's files (snapshot
    protocol) and re-append exactly once — table contents identical to the
    clean single run."""
    import json
    import shutil

    from cardano_analytics_duckdb_spark.streaming.ingest import (
        ingest_blocks_streaming,
    )

    src = tmp_path / "blocks_json"
    src.mkdir()
    with open(src / "blocks_0.jsonl", "w") as f:
        for b in fixture_blocks()[:5]:
            f.write(json.dumps(b) + "\n")
    dest = str(tmp_path / "exactly_once_lake")
    ingest_blocks_streaming(spark, str(src), dest)
    clean = {
        t: _canon_rows(spark.read.parquet(f"{dest}/{t}"))
        for t in ("tx", "utxo", "mint")
    }
    # simulate: appends committed, done-marker + checkpoint lost
    shutil.rmtree(os.path.join(dest, "_checkpoint"))
    for marker in glob.glob(os.path.join(dest, "_epochs", "*.done")):
        os.remove(marker)
    ingest_blocks_streaming(spark, str(src), dest)
    for t, rows in clean.items():
        assert _canon_rows(spark.read.parquet(f"{dest}/{t}")) == rows, t


def test_streaming_modules_use_no_driver_local_fs():
    """Every filesystem touch in the streaming modules must go through the
    Hadoop FS wrapper (lake/fsutil.py) — a driver-local glob/os probe
    returns nothing on hdfs:///s3a:// and either fails open (guards) or
    loses data (the materializer's merge probe).  Source-inspection pin so
    a convenience regression can't slip back in; os.path.join is allowed
    (pure string manipulation)."""
    import inspect

    from cardano_analytics_duckdb_spark.streaming import (
        dedup,
        ingest,
        materialize,
    )

    banned = (
        "glob.glob", "shutil.", "os.listdir", "os.path.isdir",
        "os.path.exists", "os.remove", "os.rename", "os.makedirs",
    )
    for mod in (ingest, materialize, dedup):
        src = inspect.getsource(mod)
        for needle in banned:
            assert needle not in src, f"{mod.__name__} uses {needle}"


def test_maintenance_refuses_uncommitted_epoch(spark, tmp_path):
    """compact_lake / rollback_lake must refuse to rewrite files while a
    streaming epoch is uncommitted (pending replay would roll back against
    stale listings), and compaction prunes committed epochs' stale
    snapshots."""
    import json

    from cardano_analytics_duckdb_spark.streaming.ingest import (
        compact_lake,
        ingest_blocks_streaming,
        rollback_lake,
    )

    src = tmp_path / "blocks_json"
    src.mkdir()
    with open(src / "blocks_0.jsonl", "w") as f:
        for b in fixture_blocks()[:3]:
            f.write(json.dumps(b) + "\n")
    dest = str(tmp_path / "guard_lake")
    ingest_blocks_streaming(spark, str(src), dest)

    # simulate a crash mid-epoch: snapshot present, done-marker missing
    done = glob.glob(os.path.join(dest, "_epochs", "*.done"))[0]
    os.remove(done)
    with pytest.raises(RuntimeError, match="uncommitted streaming epoch"):
        compact_lake(spark, dest)
    with pytest.raises(RuntimeError, match="uncommitted streaming epoch"):
        rollback_lake(spark, dest, to_slot=10**9)

    open(done, "w").write("")  # epoch commits; maintenance may proceed
    compact_lake(spark, dest)
    assert glob.glob(os.path.join(dest, "_epochs", "*.snapshot.json")) == []


def test_crash_during_snapshot_write_does_not_wedge_replay(spark, tmp_path):
    """Snapshots publish atomically (tmp + rename), so a crash DURING the
    snapshot write leaves only a truncated ``.tmp`` sibling; the replay
    must ignore it, take a fresh listing, and ingest exactly once."""
    import json
    import shutil

    from cardano_analytics_duckdb_spark.streaming.ingest import (
        ingest_blocks_streaming,
    )

    src = tmp_path / "blocks_json"
    src.mkdir()
    with open(src / "blocks_0.jsonl", "w") as f:
        for b in fixture_blocks()[:3]:
            f.write(json.dumps(b) + "\n")
    dest = str(tmp_path / "trunc_lake")
    ingest_blocks_streaming(spark, str(src), dest)
    clean = _canon_rows(spark.read.parquet(f"{dest}/tx"))

    # rewind to 'crashed mid-snapshot-write on the very first epoch': no
    # table data, no published snapshot, a truncated tmp, no checkpoint
    shutil.rmtree(os.path.join(dest, "_checkpoint"))
    for t in os.listdir(dest):
        if not t.startswith("_"):
            shutil.rmtree(os.path.join(dest, t))
    for f in glob.glob(os.path.join(dest, "_epochs", "*")):
        os.remove(f)
    with open(os.path.join(dest, "_epochs", "0.snapshot.json.tmp"), "w") as f:
        f.write('{"truncated')

    ingest_blocks_streaming(spark, str(src), dest)
    assert _canon_rows(spark.read.parquet(f"{dest}/tx")) == clean


def test_maintenance_lock_excludes_second_writer(spark, tmp_path):
    """The single-writer maintenance window is ENFORCED, not just
    documented: while one job holds the lake's lock, compact_lake and
    rollback_lake fail fast with the holder's identity; after release
    they run normally.  A holder that dies — by kill OR by exception —
    leaves the lock in place (a failed rewrite needs inspection before
    the next writer), and the error names the file to delete."""
    import pytest

    from cardano_analytics_duckdb_spark.lake.lock import (
        LOCK_NAME,
        maintenance_lock,
    )

    from cardano_analytics_duckdb_spark.streaming.ingest import rollback_lake

    dest = str(tmp_path / "lake")
    ingest_blocks(spark, fixture_blocks()[:3], dest, batch_size=3)

    with maintenance_lock(spark, dest, owner="job-a"):
        with pytest.raises(RuntimeError, match="job-a"):
            compact_lake(spark, dest)
        with pytest.raises(RuntimeError, match=LOCK_NAME):
            rollback_lake(spark, dest, to_slot=10**9)
        # re-entry from a second context is also excluded
        with pytest.raises(RuntimeError, match="locked"):
            with maintenance_lock(spark, dest, owner="job-b"):
                pass

    # released on exit: maintenance proceeds (and releases its own lock)
    compact_lake(spark, dest)
    compact_lake(spark, dest)

    # a body that RAISES keeps the lock held: the next writer must not
    # run over a half-finished rewrite — breaking it is a manual delete
    with pytest.raises(ValueError, match="boom"):
        with maintenance_lock(spark, dest, owner="job-c"):
            raise ValueError("boom")
    with pytest.raises(RuntimeError, match="job-c"):
        with maintenance_lock(spark, dest, owner="job-d"):
            pass
    os.remove(os.path.join(dest, LOCK_NAME))  # operator breaks the lock
    with maintenance_lock(spark, dest, owner="job-d"):
        pass


def test_compaction_is_incremental_per_partition(spark, tmp_path):
    """Compaction must not touch already-compact partitions: a partition
    at one file keeps the SAME part-file (identical path — no rewrite),
    while a fragmented partition collapses to one file."""
    from cardano_analytics_duckdb_spark.lake.fsutil import LakeFs
    from cardano_analytics_duckdb_spark.lake.generations import (
        current_generations,
        live_partition_files,
        partition_entries,
        read_table,
    )

    dest = str(tmp_path / "lake")
    blocks = fixture_blocks()[:6]
    # wave 1 + compact: every partition at one file
    ingest_blocks(spark, blocks[:3], dest, batch_size=1)
    compact_lake(spark, dest)
    lfs = LakeFs(spark, dest)

    def files_by_partition(table):
        """Current files per logical partition: the generation dir's
        files plus non-superseded hive files (post-swap appends)."""
        src = os.path.join(dest, table)
        gens = current_generations(lfs, src)
        out = {}
        for entry in partition_entries(lfs, src):
            files = list(live_partition_files(lfs, src, entry, gens))
            gen = (gens.get(entry) or {}).get("gen")
            if gen:
                files += [
                    f
                    for f in lfs.list_files(os.path.join(src, gen))
                    if f.endswith(".parquet")
                ]
            out[entry] = sorted(files)
        return out

    before = files_by_partition("tx")
    assert all(len(v) == 1 for v in before.values())

    # wave 2 appends into (at least) one partition; others stay compact
    ingest_blocks(spark, blocks[3:], dest, batch_size=1)
    mid = files_by_partition("tx")
    untouched = [d for d in before if len(mid[d]) == len(before[d]) == 1
                 and mid[d] == before[d]]
    fragmented = [d for d in mid if len(mid[d]) > 1]
    assert fragmented, "fixture waves must fragment at least one partition"

    n_rows = read_table(spark, os.path.join(dest, "tx")).count()
    compact_lake(spark, dest)
    after = files_by_partition("tx")
    # fragmented partitions collapsed; untouched ones kept their exact file
    assert all(len(after[d]) == 1 for d in fragmented)
    for d in untouched:
        assert after[d] == before[d]
    assert read_table(spark, os.path.join(dest, "tx")).count() == n_rows


def test_live_reconciliation_refuses_under_registered_materialization(
    spark, tmp_path
):
    """reconcile_rollbacks=True inherits rollback's maintained-aggregate
    gate: the in-stream rollback_lake refuses while a materialization
    marker exists, and everything flushed BEFORE the backward event stays
    committed (fail-loud, no loss)."""
    from cardano_analytics_duckdb_spark.streaming.materialize import (
        materialize_fees_by_slot_group,
    )

    dest = str(tmp_path / "lake_gate")
    blocks = fixture_blocks()[:6]
    ingest_blocks(spark, blocks[:3], dest, batch_size=10)
    materialize_fees_by_slot_group(
        spark, dest, str(tmp_path / "mv"), n_buckets=2
    )
    tail = blocks[3:]
    tail.insert(1, {"direction": "backward", "slot": blocks[3]["slot"]})
    with pytest.raises(RuntimeError, match="fees_by_slot_group"):
        ingest_blocks(
            spark, tail, dest, batch_size=1, reconcile_rollbacks=True
        )
    # the pre-event flush is committed: block 3's rows are on disk
    slots = {
        r.slot for r in spark.read.parquet(f"{dest}/tx").select("slot").collect()
    }
    assert blocks[3]["slot"] in slots


def test_malformed_backward_event_refuses_full_lake_default(spark):
    """ADVICE r8 (medium): -1 is reserved for an EXPLICIT point='origin';
    a backward event with no recognizable rollback point raises instead of
    silently defaulting to a full-lake rollback."""
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        _rollback_point_slot,
    )

    assert _rollback_point_slot({"point": "origin"}) == -1
    assert _rollback_point_slot({"point": {"slot": 7, "id": "ab"}}) == 7
    assert _rollback_point_slot({"slot": 9}) == 9  # replay-fixture shape
    for ev in (
        {},
        {"direction": "backward"},
        {"point": {}},
        {"point": {"id": "ab"}},  # point dict missing its slot
        {"point": 3.5},
    ):
        with pytest.raises(ValueError, match="full-lake"):
            _rollback_point_slot(ev)


def test_malformed_backward_event_does_not_wipe_lake(spark, tmp_path):
    """Integration of the same guard under reconcile_rollbacks=True: the
    stream fails loud at the malformed event and every previously-flushed
    row stays on disk (previously: rollback_lake(root, -1) == wipe)."""
    dest = str(tmp_path / "lake_malformed")
    blocks = fixture_blocks()[:4]
    ingest_blocks(spark, blocks[:3], dest, batch_size=10)
    n_before = spark.read.parquet(f"{dest}/tx").count()
    assert n_before > 0
    tail = [{"direction": "backward", "point": {"id": "deadbeef"}}]
    tail += blocks[3:]
    with pytest.raises(ValueError, match="rollback point"):
        ingest_blocks(
            spark, tail, dest, batch_size=1, reconcile_rollbacks=True
        )
    assert spark.read.parquet(f"{dest}/tx").count() == n_before
    # the refusal happened before the lock was taken: lake not wedged
    assert not os.path.exists(os.path.join(dest, "_maintenance.lock"))


def test_materialization_registered_in_check_to_lock_window_is_caught(
    spark, tmp_path, monkeypatch
):
    """ADVICE r8: the divergence gate re-runs INSIDE the maintenance lock,
    so a marker registered between the preflight check and lock
    acquisition still refuses the rollback — and the refusal releases the
    lock (nothing was rewritten)."""
    from cardano_analytics_duckdb_spark.streaming import materialize as mat
    from cardano_analytics_duckdb_spark.streaming.ingest import rollback_lake

    dest = str(tmp_path / "lake_race")
    blocks = fixture_blocks()[:3]
    ingest_blocks(spark, blocks, dest, batch_size=10)
    n_before = spark.read.parquet(f"{dest}/tx").count()

    real = mat.require_no_materializations
    state = {"preflight": True}

    def racy(spark_, table_dir, op, override):
        if state["preflight"]:
            # concurrent session registers its marker AFTER the preflight
            # saw a clean table but BEFORE the lock was acquired
            state["preflight"] = False
            mat._register_materialization(
                spark_, table_dir, "racy_agg", str(tmp_path / "mv")
            )
            return
        return real(spark_, table_dir, op, override)

    monkeypatch.setattr(mat, "require_no_materializations", racy)
    with pytest.raises(RuntimeError, match="racy_agg"):
        rollback_lake(spark, dest, blocks[0]["slot"], tables=["tx"])
    assert spark.read.parquet(f"{dest}/tx").count() == n_before
    # gate refusal (nothing touched) released the lock; keep-on-raise is
    # reserved for failed rewrites
    assert not os.path.exists(os.path.join(dest, "_maintenance.lock"))


def test_bootstrap_declared_layout_lifecycle(spark, tmp_path):
    """``declare_layout=True`` at ingest bootstrap writes the default
    tx_id bucket spec (declare-only — no copies yet), the first
    ``compact_lake`` builds the copy through its existing
    ``refresh_layout`` hook, and the lake's read path then serves it
    with row parity.  A user's own pre-declared spec is never
    overwritten."""
    from cardano_analytics_duckdb_spark.lake import layout
    from cardano_analytics_duckdb_spark.lake.generations import read_table
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        DEFAULT_CARDANO_SPEC,
        declare_default_layout,
    )

    dest = str(tmp_path / "lake_bootstrap_layout")
    ingest_blocks(
        spark, fixture_blocks()[:5], dest, batch_size=10,
        declare_layout=True,
    )
    spec = layout.bucket_spec(spark, dest)
    assert spec is not None
    assert spec["tables"] == DEFAULT_CARDANO_SPEC
    # declare-only: nothing built before maintenance runs
    assert layout.resolve_bucketed(spark, dest, "tx", ["tx_id"]) is None

    compact_lake(spark, dest)
    served = layout.resolve_bucketed(spark, dest, "tx", ["tx_id"])
    assert served is not None
    plain = read_table(spark, f"{dest}/tx")
    assert served.count() == plain.count()
    assert served.select("tx_id").exceptAll(plain.select("tx_id")).count() == 0

    # idempotent + non-clobbering: re-declare is a no-op, and a custom
    # spec present first wins
    assert declare_default_layout(spark, dest) is False
    dest2 = str(tmp_path / "lake_custom_spec")
    os.makedirs(dest2)
    layout.set_bucket_spec(spark, dest2, {"utxo": [["address"]]})
    ingest_blocks(
        spark, fixture_blocks()[:3], dest2, batch_size=10,
        declare_layout=True,
    )
    assert layout.bucket_spec(spark, dest2)["tables"] == {
        "utxo": [["address"]]
    }

"""Incremental materialized aggregate: after any number of increments, the
maintained table equals the batch aggregate of everything ingested — and
each increment only rewrites the buckets its delta touches."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
import pytest

from cardano_analytics_duckdb_spark.lake.tables import load_table
from cardano_analytics_duckdb_spark.streaming.materialize import (
    materialize_user_counts,
)


@pytest.fixture()
def split_events(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = tmp_path / "stream_src"
    src.mkdir()
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.parquet(str(src / "f0"))
    return events, src, second


def _as_map(spark, table):
    return {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.read.parquet(table).collect()
    }


def test_incremental_counts_match_batch_aggregate(spark, split_events, tmp_path):
    events, src, second = split_events
    dest = str(tmp_path / "mv")

    table = materialize_user_counts(spark, f"{src}/*", dest, n_buckets=8)
    # second increment arrives; only its delta is folded in
    second.coalesce(1).write.parquet(str(src / "f1"))
    materialize_user_counts(spark, f"{src}/*", dest, n_buckets=8)

    got = _as_map(spark, table)
    expect = {
        r["user_id"]: (r["n"], r["tv"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(got) == set(expect)
    for u, (n, tv) in expect.items():
        assert got[u][0] == n
        assert got[u][1] == pytest.approx(tv, rel=1e-9)


def test_rerun_without_new_input_is_a_noop(spark, split_events, tmp_path):
    _, src, _ = split_events
    dest = str(tmp_path / "mv2")
    table = materialize_user_counts(spark, f"{src}/*", dest, n_buckets=8)
    before = _as_map(spark, table)
    files_before = sorted(glob.glob(os.path.join(table, "bucket=*", "*.parquet")))
    materialize_user_counts(spark, f"{src}/*", dest, n_buckets=8)
    assert _as_map(spark, table) == before
    assert (
        sorted(glob.glob(os.path.join(table, "bucket=*", "*.parquet")))
        == files_before
    )


def test_epoch_replay_is_idempotent(spark, split_events, tmp_path):
    """foreachBatch is at-least-once: simulate a crash between the bucket
    overwrite commit and the checkpoint commit by deleting the checkpoint
    after a single-epoch run — the re-run re-delivers the SAME files under
    the SAME epoch id, and the per-bucket ``_applied_epoch`` high-water
    guard must skip the fold instead of double-counting."""
    import shutil

    _, src, _ = split_events
    dest = str(tmp_path / "mv3")
    table = materialize_user_counts(spark, f"{src}/*", dest, n_buckets=8)
    before = _as_map(spark, table)
    shutil.rmtree(os.path.join(dest, "_checkpoint_user_counts"))
    materialize_user_counts(spark, f"{src}/*", dest, n_buckets=8)
    assert _as_map(spark, table) == before


def test_fees_by_slot_group_tracks_streaming_ingest(spark, tmp_path):
    """The generalized primitive maintaining a cardano aggregate: as
    ``ingest_blocks`` appends to the lake's tx table, incremental folds
    keep (slot_group, n_txs, total_fees) equal to the batch aggregate."""
    import pyspark.sql.functions as F

    from cardano_analytics_duckdb_spark.lake.fixtures import fixture_blocks
    from cardano_analytics_duckdb_spark.streaming.ingest import ingest_blocks
    from cardano_analytics_duckdb_spark.streaming.materialize import (
        materialize_fees_by_slot_group,
    )

    lake = str(tmp_path / "lake")
    dest = str(tmp_path / "mv_fees")
    blocks = fixture_blocks()
    ingest_blocks(spark, iter(blocks[: len(blocks) // 2]), lake, batch_size=25)
    table = materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)
    ingest_blocks(spark, iter(blocks[len(blocks) // 2 :]), lake, batch_size=25)
    materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)

    got = {
        r["slot_group"]: (r["n_txs"], r["total_fees"])
        for r in spark.read.parquet(table).collect()
    }
    expect = {
        r["slot_group"]: (r["n"], r["tf"])
        for r in spark.read.parquet(os.path.join(lake, "tx"))
        .groupBy("slot_group")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tx_fee").alias("tf"))
        .collect()
    }
    assert got == expect


def test_bucket_probe_is_not_driver_local_glob(spark, split_events, tmp_path, monkeypatch):
    """The merge-vs-bootstrap probe must go through the Hadoop FS, never
    local ``glob``/``os.listdir`` — on an s3a:// dest a local glob sees []
    for a populated table and the fold would overwrite touched buckets
    without merging prior state (silent data loss).  Poison glob.glob for
    the duration of an incremental fold: the fold must still MERGE (table
    equals the batch aggregate), proving the decision path never consults
    the local filesystem API."""

    def _boom(*a, **k):  # pragma: no cover - raising is the assertion
        raise AssertionError(
            "materialize consulted local glob — invisible on s3a://"
        )

    events, src, second = split_events
    dest = str(tmp_path / "mv_fsapi")
    table = materialize_user_counts(spark, f"{src}/*", dest, n_buckets=8)
    second.coalesce(1).write.parquet(str(src / "f1"))
    monkeypatch.setattr(glob, "glob", _boom)
    materialize_user_counts(spark, f"{src}/*", dest, n_buckets=8)
    monkeypatch.undo()

    got = _as_map(spark, table)
    expect = {
        r["user_id"]: (r["n"], r["tv"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(got) == set(expect)
    for u, (n, tv) in expect.items():
        assert got[u] == (n, pytest.approx(tv, rel=1e-9))


def test_legacy_unscoped_checkpoint_is_refused(spark, split_events, tmp_path):
    """A pre-upgrade deployment checkpointed at dest/_checkpoint; starting
    a FRESH table-scoped checkpoint next to it would restart at epoch 0 and
    re-fold all history into the populated table.  The materializer must
    refuse with migration instructions, not silently double-count."""
    _, src, _ = split_events
    dest = str(tmp_path / "mv_legacy")
    table = materialize_user_counts(spark, f"{src}/*", dest, n_buckets=8)
    before = _as_map(spark, table)
    os.rename(
        os.path.join(dest, "_checkpoint_user_counts"),
        os.path.join(dest, "_checkpoint"),
    )
    with pytest.raises(RuntimeError, match="_checkpoint_user_counts"):
        materialize_user_counts(spark, f"{src}/*", dest, n_buckets=8)
    # refusal left the table untouched
    assert _as_map(spark, table) == before
    # migrating as instructed resumes cleanly (no re-fold: noop rerun)
    os.rename(
        os.path.join(dest, "_checkpoint"),
        os.path.join(dest, "_checkpoint_user_counts"),
    )
    materialize_user_counts(spark, f"{src}/*", dest, n_buckets=8)
    assert _as_map(spark, table) == before


def test_materialize_refuses_uncommitted_ingest_epoch(spark, tmp_path):
    """The ingest replay protocol deletes and re-appends an uncommitted
    epoch's partial files; a fold racing that replay double-counts (or
    hits FileNotFound).  materialize_fees_by_slot_group must refuse while
    the lake has a snapshot without its done-marker."""
    import json

    from cardano_analytics_duckdb_spark.lake.fixtures import fixture_blocks
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        ingest_blocks_streaming,
    )
    from cardano_analytics_duckdb_spark.streaming.materialize import (
        materialize_fees_by_slot_group,
    )

    src = tmp_path / "blocks_json"
    src.mkdir()
    with open(src / "blocks_0.jsonl", "w") as f:
        for b in fixture_blocks()[:3]:
            f.write(json.dumps(b) + "\n")
    lake = str(tmp_path / "lake_guard")
    ingest_blocks_streaming(spark, str(src), lake)
    done = glob.glob(os.path.join(lake, "_epochs", "*.done"))[0]
    os.remove(done)
    with pytest.raises(RuntimeError, match="uncommitted streaming epoch"):
        materialize_fees_by_slot_group(
            spark, lake, str(tmp_path / "mv_guard"), n_buckets=4
        )


def test_fees_materializer_crash_replay_under_streaming_ingest(spark, tmp_path):
    """End-to-end exactly-once: streaming ingest appends epochs to the
    lake, the materializer folds between them, then crashes AFTER the
    fold's table commit but BEFORE its checkpoint commit (simulated by
    deleting the newest checkpoint commits/ entry — Structured Streaming
    then re-delivers that epoch with identical offsets).  The resumed
    materializer must skip the already-folded epoch via the per-bucket
    ``_applied_epoch`` guard, and the table must equal a batch recompute
    of the whole tx table."""
    import json

    from cardano_analytics_duckdb_spark.lake.fixtures import fixture_blocks
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        ingest_blocks_streaming,
    )
    from cardano_analytics_duckdb_spark.streaming.materialize import (
        materialize_fees_by_slot_group,
    )

    src = tmp_path / "blocks_json"
    src.mkdir()
    blocks = fixture_blocks()
    half = len(blocks) // 2
    with open(src / "blocks_0.jsonl", "w") as f:
        for b in blocks[:half]:
            f.write(json.dumps(b) + "\n")
    lake = str(tmp_path / "lake_e2e")
    dest = str(tmp_path / "mv_e2e")
    ingest_blocks_streaming(spark, str(src), lake)
    table = materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)

    with open(src / "blocks_1.jsonl", "w") as f:
        for b in blocks[half:]:
            f.write(json.dumps(b) + "\n")
    ingest_blocks_streaming(spark, str(src), lake)
    materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)

    # crash window: table committed, checkpoint commit lost
    commits = sorted(
        glob.glob(
            os.path.join(dest, "_checkpoint_fees_by_slot_group", "commits", "*")
        ),
        key=lambda p: os.path.basename(p),
    )
    latest = [p for p in commits if not p.endswith(".tmp")][-1]
    os.remove(latest)
    # Hadoop LocalFileSystem keeps a checksum sidecar; removing the commit
    # file alone leaves a stale .crc that fails the re-written commit's
    # rename.  A real crash loses neither or both (the FS pairs them).
    crc = os.path.join(
        os.path.dirname(latest), f".{os.path.basename(latest)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)

    got = {
        r["slot_group"]: (r["n_txs"], r["total_fees"])
        for r in spark.read.parquet(table).collect()
    }
    expect = {
        r["slot_group"]: (r["n"], r["tf"])
        for r in spark.read.parquet(os.path.join(lake, "tx"))
        .groupBy("slot_group")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tx_fee").alias("tf"))
        .collect()
    }
    assert got == expect


def test_generalized_aggregate_with_composite_key(spark, split_events, tmp_path):
    """materialize_aggregate with plural key_cols and a custom bucket:
    the maintained table equals the batch aggregate keyed by
    (user_id, event_type) after incremental folds."""
    import pyspark.sql.functions as F

    from cardano_analytics_duckdb_spark.streaming.materialize import (
        EVENTS_SCHEMA,
        materialize_aggregate,
    )

    events, src, second = split_events
    dest = str(tmp_path / "mv_composite")

    def run():
        return materialize_aggregate(
            spark,
            f"{src}/*",
            dest,
            table_name="type_counts",
            schema=EVENTS_SCHEMA,
            key_cols=["user_id", "event_type"],
            agg_exprs=lambda: {
                "n": F.count(F.lit(1)),
                "v": F.sum("value"),
            },
            n_buckets=4,
        )

    table = run()
    second.coalesce(1).write.parquet(str(src / "f1"))
    run()

    got = {
        (r["user_id"], r["event_type"]): (r["n"], r["v"])
        for r in spark.read.parquet(table).collect()
    }
    expect = {
        (r["user_id"], r["event_type"]): (r["n"], r["v"])
        for r in events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert set(got) == set(expect)
    for k, (n, v) in expect.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(v, rel=1e-9)


def test_materialized_hll_distinct_equals_batch_sketch(spark, split_events, tmp_path):
    """Union-mergeable sketch state through the generalized combine:
    the maintained HLL table after two incremental folds must give the
    SAME estimates as one batch sketch over all data (DataSketches HLL
    union is associative and duplicate-insensitive, so fold order cannot
    change the state), and land within 5% of the exact distinct count."""
    import pyspark.sql.functions as F

    from cardano_analytics_duckdb_spark.streaming.materialize import (
        materialize_distinct_approx,
        read_distinct_estimates,
    )

    events, src, second = split_events
    dest = str(tmp_path / "mv_hll")
    materialize_distinct_approx(spark, f"{src}/*", dest, n_buckets=4)
    second.coalesce(1).write.parquet(str(src / "f1"))  # second wave arrives
    materialize_distinct_approx(spark, f"{src}/*", dest, n_buckets=4)

    got = {
        r["event_type"]: (r["n_rows"], r["approx_distinct"])
        for r in read_distinct_estimates(spark, dest).collect()
    }
    expect = {
        r["event_type"]: (r["n"], r["est"], r["exact"])
        for r in spark.read.parquet(f"{src}/*")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"))
            ).alias("est"),
            F.count_distinct(F.col("user_id")).alias("exact"),
        )
        .collect()
    }
    assert set(got) == set(expect)
    for et, (n_rows, approx) in got.items():
        n, est, exact = expect[et]
        assert n_rows == n
        assert approx == est  # sketch-exact: fold order cannot matter
        assert abs(approx - exact) <= max(1, 0.05 * exact)


def test_row_changing_maintenance_refuses_registered_materialization(
    spark, tmp_path
):
    """Fail-loud gate (r8): a maintained aggregate folds each source file
    exactly once, so rollback/upsert rewrites silently diverge it.  The
    materializer registers a marker at its source; rollback_lake and
    upsert_partitioned refuse while it exists, proceed with the explicit
    override or after deregistration.  Compaction (row-preserving) is
    exempt."""
    from cardano_analytics_duckdb_spark.lake.fixtures import fixture_blocks
    from cardano_analytics_duckdb_spark.lake.upsert import upsert_partitioned
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        compact_lake,
        ingest_blocks,
        rollback_lake,
    )
    from cardano_analytics_duckdb_spark.streaming.materialize import (
        deregister_materialization,
        materialize_fees_by_slot_group,
        registered_materializations,
    )

    lake = str(tmp_path / "lake")
    dest = str(tmp_path / "mv_fees")
    ingest_blocks(spark, fixture_blocks()[:30], lake, batch_size=10)
    materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)
    tx = os.path.join(lake, "tx")
    regs = registered_materializations(spark, tx)
    assert "fees_by_slot_group" in regs
    assert regs["fees_by_slot_group"]["dest"] == dest

    max_slot = (
        spark.read.parquet(tx).agg(F.max("slot")).first()[0]
    )
    with pytest.raises(RuntimeError, match="fees_by_slot_group"):
        rollback_lake(spark, lake, max_slot - 1)
    one = spark.read.parquet(tx).limit(1)
    with pytest.raises(RuntimeError, match="fees_by_slot_group"):
        upsert_partitioned(spark, lake, "tx", one, ["tx_hash"])

    # row-preserving maintenance stays unguarded
    compact_lake(spark, lake, tables=["tx"])
    # the explicit override proceeds (caller recomputes in batch after)
    dropped = rollback_lake(
        spark, lake, max_slot - 1, allow_stale_materializations=True
    )
    assert dropped.get("tx", 0) >= 1

    # deregistration also lifts the gate
    deregister_materialization(spark, tx, "fees_by_slot_group")
    assert registered_materializations(spark, tx) == {}
    rollback_lake(spark, lake, max_slot - 2)


def test_compaction_refuses_unfolded_appends(spark, tmp_path):
    """The gate the seeded walk's first failure demanded: compaction must
    refuse while a maintained aggregate has not-yet-folded source files
    (the swap would hide them in generation dirs the file stream can't
    list — silent row loss), succeed immediately after a fold drains the
    backlog, and honor the explicit override."""
    from cardano_analytics_duckdb_spark.lake.fixtures import fixture_blocks
    from cardano_analytics_duckdb_spark.lake.generations import read_table
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        compact_lake,
        ingest_blocks,
    )
    from cardano_analytics_duckdb_spark.streaming.materialize import (
        materialize_fees_by_slot_group,
        unfolded_source_files,
    )

    lake = str(tmp_path / "lake")
    dest = str(tmp_path / "mv_fees")
    blocks = fixture_blocks()
    ingest_blocks(spark, blocks[:20], lake, batch_size=10)
    table = materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)
    tx = os.path.join(lake, "tx")

    # folded lake: nothing unfolded, compaction proceeds
    from cardano_analytics_duckdb_spark.streaming.materialize import (
        registered_materializations,
    )

    marker = registered_materializations(spark, tx)["fees_by_slot_group"]
    assert unfolded_source_files(spark, tx, marker) == []
    compact_lake(spark, lake, tables=["tx"])

    # new appends the stream has not folded -> refuse
    ingest_blocks(spark, blocks[20:40], lake, batch_size=10)
    assert unfolded_source_files(spark, tx, marker)
    with pytest.raises(RuntimeError, match="not-yet-folded"):
        compact_lake(spark, lake, tables=["tx"])

    # one fold drains the backlog; compaction proceeds and the aggregate
    # still equals the batch recompute of the generation-resolved table
    materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)
    compact_lake(spark, lake, tables=["tx"])
    got = {
        r["slot_group"]: (r["n_txs"], r["total_fees"])
        for r in spark.read.parquet(table).collect()
    }
    expect = {
        r["slot_group"]: (r["n"], r["tf"])
        for r in read_table(spark, tx)
        .groupBy("slot_group")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tx_fee").alias("tf"))
        .collect()
    }
    assert got == expect

    # override: the operator takes responsibility (recompute in batch)
    ingest_blocks(spark, blocks[40:50], lake, batch_size=10)
    compact_lake(
        spark, lake, tables=["tx"], allow_stale_materializations=True
    )


def test_rebuild_after_rollback_restores_exactly_once(spark, tmp_path):
    """The recovery tool the gates prescribe: after a rollback ran with
    the override (aggregate now diverged), rebuild_fees_by_slot_group
    restores the table from the generation-resolved truth AND resets the
    stream so later appends keep folding exactly-once — including a
    bootstrap over the now generation-managed source, which the plain
    materializer refuses without the rebuild's breadcrumb."""
    from cardano_analytics_duckdb_spark.lake.fixtures import fixture_blocks
    from cardano_analytics_duckdb_spark.lake.generations import read_table
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        ingest_blocks,
        rollback_lake,
    )
    from cardano_analytics_duckdb_spark.streaming.materialize import (
        materialize_fees_by_slot_group,
        rebuild_fees_by_slot_group,
    )

    lake = str(tmp_path / "lake")
    dest = str(tmp_path / "mv_fees")
    blocks = fixture_blocks()
    ingest_blocks(spark, blocks[:30], lake, batch_size=10)
    table = materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)
    tx = os.path.join(lake, "tx")

    def batch_expect():
        return {
            r["slot_group"]: (r["n"], r["tf"])
            for r in read_table(spark, tx)
            .groupBy("slot_group")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("tx_fee").alias("tf"))
            .collect()
        }

    def table_state():
        return {
            r["slot_group"]: (r["n_txs"], r["total_fees"])
            for r in spark.read.parquet(table).collect()
        }

    # row-changing maintenance with the override: aggregate diverges
    mid_slot = (
        spark.read.parquet(tx)
        .agg(F.expr("percentile_approx(slot, 0.5)"))
        .first()[0]
    )
    rollback_lake(
        spark, lake, int(mid_slot), allow_stale_materializations=True
    )
    assert table_state() != batch_expect()  # the divergence is real

    rebuilt = rebuild_fees_by_slot_group(spark, lake, dest, n_buckets=4)
    assert rebuilt == table
    assert table_state() == batch_expect()

    # the stream resumes exactly-once over post-rebuild appends only —
    # and its fresh-checkpoint bootstrap over the generation-managed
    # source is authorized by the rebuild's breadcrumb
    ingest_blocks(spark, blocks[30:45], lake, batch_size=15)
    materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)
    assert table_state() == batch_expect()
    # idempotence: a no-new-input fold changes nothing
    materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)
    assert table_state() == batch_expect()

    # the rebuild breadcrumb is single-use: consumed by the bootstrap
    # above, so deleting the ESTABLISHED checkpoint (whose folds are in
    # the table) brings back the refusal instead of authorizing a
    # double-counting refold
    assert not os.path.exists(
        os.path.join(dest, "_batch_baseline_fees_by_slot_group.json")
    )
    import shutil

    shutil.rmtree(os.path.join(dest, "_checkpoint_fees_by_slot_group"))
    with pytest.raises(RuntimeError, match="generation-managed"):
        materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)


def test_rebuild_all_siblings_over_one_source(spark, tmp_path):
    """The documented multi-aggregate procedure: with TWO maintained
    aggregates registered over the same tx source, recovery after an
    overridden rollback rebuilds BOTH in one window — and both keep
    folding exactly-once afterwards.  (A sibling left unrebuilt would
    diverge: the rebuild's sweep hides even FOLDED hive files from the
    other stream's future, which is why the docstring mandates this.)"""
    from cardano_analytics_duckdb_spark.lake.fixtures import fixture_blocks
    from cardano_analytics_duckdb_spark.lake.generations import read_table
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        ingest_blocks,
        rollback_lake,
    )
    from cardano_analytics_duckdb_spark.streaming.materialize import (
        materialize_aggregate,
        materialize_fees_by_slot_group,
        rebuild_fees_by_slot_group,
        rebuild_lake_materialization,
    )

    lake = str(tmp_path / "lake")
    dest_fees = str(tmp_path / "mv_fees")
    dest_counts = str(tmp_path / "mv_counts")
    blocks = fixture_blocks()
    ingest_blocks(spark, blocks[:30], lake, batch_size=10)
    tx = os.path.join(lake, "tx")

    counts_spec = dict(
        table_name="tx_counts",
        key_cols=["slot_group"],
        agg_exprs=lambda: {"n": F.count(F.lit(1))},
        bucket_expr=lambda: F.pmod(F.col("slot_group"), F.lit(4)),
        n_buckets=4,
    )

    def fold_both():
        fees = materialize_fees_by_slot_group(
            spark, lake, dest_fees, n_buckets=4
        )
        counts = materialize_aggregate(
            spark, tx, dest_counts,
            schema=read_table(spark, tx).schema, **counts_spec,
        )
        return fees, counts

    fees_t, counts_t = fold_both()

    def check_both():
        expect = {
            r["slot_group"]: r["n"]
            for r in read_table(spark, tx)
            .groupBy("slot_group")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got_fees = {
            r["slot_group"]: r["n_txs"]
            for r in spark.read.parquet(fees_t).collect()
        }
        got_counts = {
            r["slot_group"]: r["n"]
            for r in spark.read.parquet(counts_t).collect()
        }
        assert got_fees == expect and got_counts == expect

    check_both()
    mid = spark.read.parquet(tx).agg(
        F.expr("percentile_approx(slot, 0.5)")
    ).first()[0]
    rollback_lake(spark, lake, int(mid), allow_stale_materializations=True)
    # one maintenance window, both aggregates rebuilt
    rebuild_fees_by_slot_group(spark, lake, dest_fees, n_buckets=4)
    rebuild_lake_materialization(
        spark, lake, "tx", dest_counts, **counts_spec
    )
    check_both()
    # both streams resume exactly-once over new appends
    ingest_blocks(spark, blocks[30:45], lake, batch_size=15)
    fold_both()
    check_both()


def test_compaction_refuses_inside_crash_window(spark, tmp_path):
    """Seen is not folded: a crash between the fold's table commit and
    its checkpoint commit leaves the newest batch's files in the
    sources log but without a commit — Structured Streaming re-reads
    those exact paths on resume, so compacting them away would wedge the
    stream on FileNotFound.  The gate must count them as unfolded (it
    thresholds on the last COMMITTED batch id, not on sources-log
    presence); one refold closes the window."""
    from cardano_analytics_duckdb_spark.lake.fixtures import fixture_blocks
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        compact_lake,
        ingest_blocks,
    )
    from cardano_analytics_duckdb_spark.streaming.materialize import (
        materialize_fees_by_slot_group,
        registered_materializations,
        unfolded_source_files,
    )

    lake = str(tmp_path / "lake")
    dest = str(tmp_path / "mv_fees")
    blocks = fixture_blocks()
    ingest_blocks(spark, blocks[:15], lake, batch_size=15)
    materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)
    ingest_blocks(spark, blocks[15:30], lake, batch_size=15)
    materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)
    tx = os.path.join(lake, "tx")
    marker = registered_materializations(spark, tx)["fees_by_slot_group"]
    assert unfolded_source_files(spark, tx, marker) == []

    # crash window: drop the newest checkpoint commit (table row state
    # already carries the fold — the _applied_epoch guard dedupes it)
    commits = sorted(
        p
        for p in glob.glob(
            os.path.join(
                dest, "_checkpoint_fees_by_slot_group", "commits", "*"
            )
        )
        if not p.endswith((".tmp", ".crc"))
    )
    os.remove(commits[-1])
    crc = os.path.join(
        os.path.dirname(commits[-1]), f".{os.path.basename(commits[-1])}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)

    assert unfolded_source_files(spark, tx, marker)  # pending replay
    with pytest.raises(RuntimeError, match="not-yet-folded"):
        compact_lake(spark, lake, tables=["tx"])

    # the refold replays the pending batch (table-side no-op) and
    # recommits; the window closes and compaction proceeds
    materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)
    assert unfolded_source_files(spark, tx, marker) == []
    compact_lake(spark, lake, tables=["tx"])


# -- seeded exactly-once walk --------------------------------------------------
# The crash-replay tests above pick ONE interleaving each; this walk
# explores a seeded random sequence of {ingest epoch, materialize, crash
# the newest checkpoint commit, compact the lake} and re-checks the
# exactly-once invariant — maintained table == batch recompute of the
# generation-resolved tx table — after EVERY materialize.  Compact is a
# deliberate participant: the materializer's contract says an established
# checkpoint survives compaction (superseded files were folded pre-swap,
# the swap preserves their aggregate contribution), and the walk holds it
# to that across arbitrary orderings.  Set SOAK_SEEDS=N for fresh seeds
# beyond the pinned one (failures get pinned as named regressions).


def _run_streaming_walk(spark, root: str, seed: int, n_steps: int):
    import json
    import random

    from cardano_analytics_duckdb_spark.lake.fixtures import fixture_blocks
    from cardano_analytics_duckdb_spark.lake.generations import read_table
    from cardano_analytics_duckdb_spark.streaming.ingest import (
        compact_lake,
        ingest_blocks_streaming,
        rollback_lake,
    )
    from cardano_analytics_duckdb_spark.streaming.materialize import (
        materialize_fees_by_slot_group,
        rebuild_fees_by_slot_group,
    )

    rng = random.Random(seed)
    src = os.path.join(root, "blocks_json")
    os.makedirs(src)
    lake = os.path.join(root, "lake")
    dest = os.path.join(root, "mv_fees")
    blocks = fixture_blocks()
    cursor = 0
    n_files = 0

    def feed(n):
        nonlocal cursor, n_files
        chunk = blocks[cursor:cursor + n]
        if not chunk:
            return False
        with open(os.path.join(src, f"blocks_{n_files}.jsonl"), "w") as f:
            for b in chunk:
                f.write(json.dumps(b) + "\n")
        cursor += len(chunk)
        n_files += 1
        ingest_blocks_streaming(spark, src, lake)
        return True

    def check(step, op, history):
        table = materialize_fees_by_slot_group(spark, lake, dest, n_buckets=4)
        got = {
            r["slot_group"]: (r["n_txs"], r["total_fees"])
            for r in spark.read.parquet(table).collect()
        }
        expect = {
            r["slot_group"]: (r["n"], r["tf"])
            for r in read_table(spark, os.path.join(lake, "tx"))
            .groupBy("slot_group")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("tx_fee").alias("tf"))
            .collect()
        }
        assert got == expect, (
            f"exactly-once divergence after step {step} ({op});"
            f" history={history}"
        )

    def list_commits():
        return sorted(
            p
            for p in glob.glob(
                os.path.join(
                    dest, "_checkpoint_fees_by_slot_group", "commits", "*"
                )
            )
            if not p.endswith((".tmp", ".crc"))
        )

    # Commits that existed when a compact ran are DURABLE history: a real
    # crash window exists only between an in-flight fold's table commit
    # and its checkpoint commit.  Deleting one of these would simulate an
    # impossible event (a durable file un-written) — and since compact
    # vacuumed the batch's source files, the replay would FileNotFound on
    # a state no real crash can produce.
    protected_commits: set[str] = set()

    def crash():
        commits = list_commits()
        if not commits or commits[-1] in protected_commits:
            return False
        latest = commits[-1]
        os.remove(latest)
        crc = os.path.join(
            os.path.dirname(latest), f".{os.path.basename(latest)}.crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
        return True

    # bootstrap: first epoch + first fold, so compact always has an
    # established checkpoint to preserve (the contract's precondition)
    feed(rng.randint(3, 8))
    check(-1, "bootstrap", [])

    history = []
    for step in range(n_steps):
        op = rng.choice(
            ["ingest", "materialize", "crash", "compact", "rollback"]
        )
        history.append(op)
        if op == "ingest":
            feed(rng.randint(2, 8))
        elif op == "materialize":
            check(step, op, history)
        elif op == "crash":
            if crash() and rng.random() < 0.5:
                # replay must be exactly-once: the re-delivered epoch's
                # buckets carry _applied_epoch and are skipped.  Half the
                # time the refold is DEFERRED instead, leaving the crash
                # window open for a later compact to hit (whose gate must
                # count the pending batch's files as unfolded — replay
                # will re-read those exact paths)
                check(step, "crash+refold", history)
        elif op == "compact":
            # Compaction under a maintained aggregate refuses while
            # unfolded appends exist (they would vanish into generation
            # dirs the file stream can't list — the bug this walk found);
            # the operator response the error names is fold-then-compact.
            try:
                compact_lake(spark, lake, tables=["tx"])
            except RuntimeError as e:
                assert "not-yet-folded" in str(e), e
                check(step, "pre-compact fold", history)
                compact_lake(spark, lake, tables=["tx"])
            protected_commits.update(list_commits())
            check(step, "compact+fold", history)
        elif op == "rollback":
            # the FULL maintenance story: row-changing maintenance with
            # the override (aggregate diverges by design), then the
            # prescribed recovery — batch rebuild + stream reset — after
            # which the exactly-once invariant must hold again.  Median
            # target keeps the table non-empty under repeated rollbacks.
            tx = os.path.join(lake, "tx")
            to_slot = int(
                read_table(spark, tx)
                .agg(F.expr("percentile_approx(slot, 0.5)"))
                .first()[0]
            )
            rollback_lake(
                spark, lake, to_slot, allow_stale_materializations=True
            )
            rebuild_fees_by_slot_group(spark, lake, dest, n_buckets=4)
            # the rebuild dropped the old checkpoint: commit paths start
            # over, and the fresh stream's commits are crashable again
            protected_commits.clear()
            check(step, "rollback+rebuild", history)

    check(n_steps, "final", history)


def test_streaming_exactly_once_walk(spark, tmp_path):
    _run_streaming_walk(spark, str(tmp_path), 20260816, 8)


_SOAK = int(os.environ.get("SOAK_SEEDS", "0"))
_SOAK_OFF = int(os.environ.get("SOAK_OFFSET", "0"))


@pytest.mark.skipif(not _SOAK, reason="soak: set SOAK_SEEDS=N to enable")
@pytest.mark.parametrize("i", range(_SOAK))
def test_soak_streaming_walk(spark, tmp_path, i):
    _run_streaming_walk(
        spark, str(tmp_path), 20260816 + 1 + _SOAK_OFF + i, 8
    )

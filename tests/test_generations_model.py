"""Model-based consistency walk for the generation-pointer layer.

A seeded random sequence of lake operations — append, compact (vacuum at
end or deferred), upsert (both vacuum modes), rollback, explicit vacuum —
runs against both the real table and a driver-side dict model.  After
EVERY step, ``generations.read_table`` must equal the model exactly: no
lost appends, no resurrected superseded rows, no duplicates from a
half-applied merge, no rows surviving past a rollback point, regardless
of operation interleaving.  A manifest-pruned range read is checked at
every step too — the manifest is built once at bootstrap and then only
refreshed when compaction happens to run, so the walk also proves data
skipping fails OPEN (never drops a live file) across arbitrarily stale
stats and every pointer state.  This is the invariant the per-op tests
check pointwise; the walk checks it compositionally (the bug class where
op A's leftover state breaks op B — it caught the INT32-vs-INT64
partition column mismatch between compaction's and upsert's generation
writers on its first run).
"""

from __future__ import annotations

import os
import random

import pyspark.sql.functions as F

from cardano_analytics_duckdb_spark.lake.fsutil import LakeFs
from cardano_analytics_duckdb_spark.lake.generations import (
    read_table,
    vacuum_superseded,
)
from cardano_analytics_duckdb_spark.lake.lock import maintenance_lock
from cardano_analytics_duckdb_spark.lake.upsert import upsert_partitioned
from cardano_analytics_duckdb_spark.streaming.ingest import (
    _compact_lake_locked,
    _rollback_lake_locked,
)

SCHEMA = "k long, v string, slot long, slot_group long"
N_STEPS = 16
SEED = 20260814


def _lake_rows(spark, t):
    return sorted(
        map(
            tuple,
            read_table(spark, t)
            .select("k", "v", "slot", "slot_group")
            .collect(),
        )
    )


def _model_rows(model):
    return sorted((k, v, s, g) for k, (v, s, g) in model.items())


def test_random_walk_matches_model(spark, tmp_path):
    rng = random.Random(SEED)
    root = str(tmp_path)
    t = os.path.join(root, "t")
    model: dict[int, tuple[str, int, int]] = {}
    next_key = 0

    def fresh_rows(n):
        nonlocal next_key
        out = []
        for _ in range(n):
            slot = rng.randrange(0, 300)
            g = (slot // 100) * 100
            out.append((next_key, f"v{next_key}", slot, g))
            model[next_key] = (f"v{next_key}", slot, g)
            next_key += 1
        return out

    # bootstrap with a plain append so every op has data to work on
    spark.createDataFrame(fresh_rows(6), SCHEMA).write.mode(
        "append"
    ).partitionBy("slot_group").parquet(t)
    # build the stats manifest ONCE; compaction refreshes it in passing,
    # every other op leaves it stale — pruned reads must stay exact anyway
    from cardano_analytics_duckdb_spark.lake.manifest import (
        build_manifest,
        read_pruned,
    )

    build_manifest(spark, t)

    def _pruned_rows(lo, hi):
        return sorted(
            map(
                tuple,
                read_pruned(spark, t, "slot", lo, hi)
                .select("k", "v", "slot", "slot_group")
                .collect(),
            )
        )

    ops = ["append", "compact", "compact_defer", "upsert", "upsert_defer",
           "rollback", "vacuum"]
    history = []
    for step in range(N_STEPS):
        op = rng.choice(ops)
        history.append(op)
        if op == "append":
            spark.createDataFrame(
                fresh_rows(rng.randint(1, 4)), SCHEMA
            ).write.mode("append").partitionBy("slot_group").parquet(t)
        elif op in ("compact", "compact_defer"):
            with maintenance_lock(spark, root, owner=f"walk-{step}"):
                _compact_lake_locked(
                    spark, root, tables=["t"],
                    vacuum="end" if op == "compact" else "defer",
                )
        elif op in ("upsert", "upsert_defer"):
            if not model:
                continue
            # replace a random existing key (slot/partition fixed by the
            # key, per the upsert contract), insert a fresh one
            victim = rng.choice(sorted(model))
            _, s_old, g_old = model[victim]
            model[victim] = (f"u{step}", s_old, g_old)
            updates = [(victim, f"u{step}", s_old, g_old)] + fresh_rows(1)
            upsert_partitioned(
                spark, root, "t",
                spark.createDataFrame(updates, SCHEMA), ["k"],
                vacuum="end" if op == "upsert" else "defer",
            )
        elif op == "rollback":
            to_slot = rng.choice([60, 140, 230])
            with maintenance_lock(spark, root, owner=f"walk-{step}"):
                _rollback_lake_locked(
                    spark, root, to_slot, tables=["t"],
                    vacuum=rng.choice(["end", "defer"]),
                )
            for k in [k for k, (_, s, _) in model.items() if s > to_slot]:
                del model[k]
        elif op == "vacuum":
            vacuum_superseded(spark, t)
        if not model:
            continue  # a rollback can empty the table; read would raise
        got = _lake_rows(spark, t)
        assert got == _model_rows(model), (
            f"divergence after step {step} ({op}); history={history}"
        )
        # no duplicate keys ever survive any interleaving
        assert len({k for k, _, _, _ in got}) == len(got)
        # data skipping over the (possibly stale) manifest stays exact
        lo = rng.randrange(0, 200)
        hi = lo + rng.randrange(20, 120)
        expect = sorted(
            (k, v, s, g)
            for k, (v, s, g) in model.items()
            if lo <= s <= hi
        )
        assert _pruned_rows(lo, hi) == expect, (
            f"pruned-read divergence after step {step} ({op}) on "
            f"slot in [{lo}, {hi}]; history={history}"
        )

    # end state: a final vacuum reclaims everything stale, rows unchanged
    vacuum_superseded(spark, t)
    assert _lake_rows(spark, t) == _model_rows(model)
    assert read_table(spark, t).filter(F.col("k").isNull()).count() == 0

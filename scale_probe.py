#!/usr/bin/env python
"""Measure the AQE on/off delta at ~10x the bench scale (one-off probe).

Why this exists: the per-round bench (bench.py, sf0.1, sub-second queries)
runs its timed pass with AQE OFF because adaptive re-planning adds 50-150 ms
of driver latency per shuffle stage — pure overhead at that scale — while
the production session (plans/session.py) ships AQE ON for the 100 TB
deployment.  That divergence is recorded per-run as
``production_conf_value``, but a number at ONE scale can't show the
crossover.  This probe materializes a ~10x copy of the sf0.1 fact tables
(shuffle-heavy shapes become multi-second, many-partition jobs — the regime
AQE targets) and times the same plans under both settings, writing
``SCALE_PROBE.json`` so the config decision is evidence, not reasoning.

Data: sf0.1 lineitem/orders replicated REPLICAS times with key offsets per
replica (so join/group cardinalities scale too, not just row counts),
written as multi-file parquet to a scratch dir — scans parallelize like a
real partitioned lake, not like the driver's single-row-group testdata.

Run solo (never concurrently with pytest/bench — noisy-neighbor host):
    python scale_probe.py [scratch_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from cardano_analytics_duckdb_spark.plans import get_session

REPLICAS = 10
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_scaled(spark, scratch: str) -> None:
    """Replicate lineitem/orders with per-replica key offsets."""
    if os.path.exists(scratch):
        shutil.rmtree(scratch)
    rep = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    okey_span = orders.agg(F.max("o_orderkey")).first()[0] + 1
    (
        li.crossJoin(F.broadcast(rep))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * okey_span)
        .drop("rep")
        .repartition(64)
        .write.parquet(os.path.join(scratch, "lineitem"))
    )
    (
        orders.crossJoin(F.broadcast(rep))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * okey_span)
        .drop("rep")
        .repartition(64)
        .write.parquet(os.path.join(scratch, "orders"))
    )


def probe_queries(spark, scratch: str) -> dict:
    li = spark.read.parquet(os.path.join(scratch, "lineitem"))
    orders = spark.read.parquet(os.path.join(scratch, "orders"))
    return {
        # shuffle-heavy grouped agg (pricing-summary shape)
        "grouped_agg": li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.sum("l_extendedprice"), F.count("*")
        ),
        # large-large sort-merge join + agg (the shape AQE's coalescing
        # and skew handling target)
        "fact_fact_join": li.join(
            orders, li.l_orderkey == orders.o_orderkey
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice"), F.count("*")),
        # high-cardinality agg then top-k (per-order rollup)
        "per_order_rollup": li.groupBy("l_orderkey")
        .agg(F.sum("l_extendedprice").alias("rev"))
        .orderBy(F.desc("rev"))
        .limit(100),
    }


def timed_pass(spark, scratch: str, n_runs: int = 3) -> dict[str, float]:
    out = {}
    for name, df in probe_queries(spark, scratch).items():
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(sorted(runs)[n_runs // 2], 3)
    return out


def manifest_probe(spark, scratch: str, n_runs: int = 3) -> dict:
    """Data-skipping evidence: the SAME range query on the SAME rows under
    two layouts — as-written (random 64-file) vs z-ordered — each with a
    stats manifest.  Records files kept and wall time of the pruned read
    vs the full-scan filter; the point being measured: skipping quality
    is a property of LAYOUT (zorder tightens per-file spans), and the
    manifest is what converts that into files never opened."""
    from cardano_analytics_duckdb_spark.lake.manifest import (
        build_manifest,
        prune_files,
        read_pruned,
    )
    from cardano_analytics_duckdb_spark.lake.zorder import zorder_write

    linear = os.path.join(scratch, "lineitem")
    li = spark.read.parquet(linear)
    zpath = os.path.join(scratch, "lineitem_z")
    zorder_write(
        li, zpath, ["l_orderkey", "l_partkey"], out_files=64
    )
    lo, hi = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    qlo, qhi = float(lo), float(lo) + (float(hi) - float(lo)) / 16.0
    out = {"probe": f"l_partkey range 1/16 of span, one dim of a 2-dim z-order"}
    for name, path in (("linear", linear), ("zorder", zpath)):
        build_manifest(spark, path)
        kept = prune_files(spark, path, "l_partkey", qlo, qhi)
        total = len(prune_files(spark, path, "l_partkey", None, None))
        t_full, t_pruned = [], []
        for _ in range(n_runs):
            full_df = spark.read.parquet(path).filter(
                (F.col("l_partkey") >= qlo) & (F.col("l_partkey") <= qhi)
            )
            t0 = time.perf_counter()
            full_df.write.format("noop").mode("overwrite").save()
            t_full.append(time.perf_counter() - t0)
            pruned_df = read_pruned(spark, path, "l_partkey", qlo, qhi)
            t0 = time.perf_counter()
            pruned_df.write.format("noop").mode("overwrite").save()
            t_pruned.append(time.perf_counter() - t0)
        out[name] = {
            "files_total": total,
            "files_kept": len(kept),
            "t_full_scan": round(sorted(t_full)[n_runs // 2], 3),
            "t_pruned": round(sorted(t_pruned)[n_runs // 2], 3),
        }
    return out


def main() -> None:
    scratch = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_scale_probe"
    # Production shuffle sizing posture: oversized partition count, AQE
    # coalesces down (plans/session.py docstring) — the probe must compare
    # AQE against the same static setting a cluster job would carry.
    spark = get_session(app_name="scale-probe", shuffle_partitions=200)
    build_scaled(spark, scratch)
    results = {}
    # warmup both settings once so codegen/JIT isn't charged to either
    for aqe in ("false", "true"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        timed_pass(spark, scratch, n_runs=1)
    for aqe in ("false", "true"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        results[f"aqe_{aqe}"] = timed_pass(spark, scratch)
    summary = {
        "sf_equivalent": f"{SF_DIR} x {REPLICAS}",
        "shuffle_partitions": 200,
        "queries": results,
        "total_aqe_off": round(sum(results["aqe_false"].values()), 3),
        "total_aqe_on": round(sum(results["aqe_true"].values()), 3),
    }
    summary["aqe_on_over_off"] = round(
        summary["total_aqe_on"] / summary["total_aqe_off"], 3
    )
    summary["manifest_skipping"] = manifest_probe(spark, scratch)
    with open("SCALE_PROBE.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion through the noop sink (full plan runs,
nothing is collected to the driver), timed wall-clock.  A warmup query runs
first so JVM/codegen startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cardano_analytics_duckdb_spark.operators import all_queries
from cardano_analytics_duckdb_spark.plans import get_session

HEADLINE = [
    "high_value_orders",
    "order_summary_stats",
    "pricing_summary",
    "revenue_by_region",
    "order_brand_sets",
    "cross_nation_orders",
    "top_orders_per_customer",
    "user_sessions",
    "events_tumbling_5min",
    "exact_dedup_groups",
    "minhash_band_buckets",
    "simhash_fingerprints",
    "cosine_topk",
    "lsh_bucket_assignments",
    "doc_quality_scores",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Interactive-bench posture: AQE's per-stage re-planning costs 50-150 ms
    # of driver latency per shuffle stage — pure overhead on sub-second
    # queries whose shuffle partitions are already sized to the core count.
    # The production session (plans/session.py) keeps AQE on: at cluster /
    # 100 TB scale its coalescing + skew splitting dominate that latency.
    # Since r7 the production session itself ships constraintPropagation
    # and the console progress bar OFF (both semantics-free, see
    # plans/session.py), so AQE is the ONLY conf this bench posture
    # changes — the companion pass below prices exactly that delta.
    spark = get_session(
        app_name="bench",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    queries = all_queries()

    # Warm the lake: repartition+cache each table (single-row-group testdata
    # parquet otherwise scans as ONE task regardless of cores), then run each
    # headline query once so JIT/codegen isn't charged to the timed pass.
    from cardano_analytics_duckdb_spark.lake.tables import warm_lake

    warm_lake(spark, sf_dir)
    for name in HEADLINE:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # DuckDB side of the same queries (oracle SQL on the same parquet), so
    # the Spark-vs-single-node-baseline ratio is a recorded fact in every
    # BENCH_r*.json rather than a remembered number.  Best-effort: if the
    # baseline can't set up, the Spark column still reports.
    con = None
    oracles = {}
    try:
        import duckdb

        from cardano_analytics_duckdb_spark.operators import all_oracles

        oracles = all_oracles()
        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count()}")
        for t in (
            "region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings",
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
            )
        for name in HEADLINE:
            con.execute(oracles[name]).fetchall()  # warmup
    except Exception:
        con = None

    # Median of 7 timed runs per query (raised from 5 in r6: the sub-200 ms
    # queries showed ±50% round-over-round swings with unchanged code, and
    # a median over 7 discards one more outlier on each side), with the
    # Spark run and its DuckDB baseline INTERLEAVED inside each round: the
    # host has noisy-neighbor CPU variance (observed 3x swings on identical
    # plans), and timing all of one engine then all of the other lets a
    # noise burst land on a single side and skew the ratio.  Pairing the
    # measurements makes the recorded ratio robust to drifts slower than
    # one round.
    n_runs = 7
    timings: dict[str, float] = {}
    duck_timings: dict[str, float] = {}
    # Run spread, recorded so a noisy snapshot is self-identifying (r7
    # showed builder-vs-driver ratio divergence of 1.39 vs 1.725 with
    # identical code — entirely host contention at 70-300 ms/query).
    # Per engine and query: [min, max] of the 7 runs; plus best-of-7
    # totals and a contention-resistant companion ratio computed on them
    # (best-of-N discards noise bursts symmetrically on both engines).
    spark_spread: dict[str, list[float]] = {}
    duck_spread: dict[str, list[float]] = {}
    spark_best: dict[str, float] = {}
    duck_best: dict[str, float] = {}
    for name in HEADLINE:
        s_runs, d_runs = [], []
        for _ in range(n_runs):
            df = queries[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            s_runs.append(time.perf_counter() - t0)
            if con is not None:
                # Baseline stays best-effort during the timed pass too: a
                # DuckDB error here must not abort the bench and lose the
                # Spark timings.
                try:
                    t0 = time.perf_counter()
                    con.execute(oracles[name]).fetchall()
                    d_runs.append(time.perf_counter() - t0)
                except Exception:
                    con = None
                    d_runs = []
        timings[name] = round(sorted(s_runs)[n_runs // 2], 3)
        spark_spread[name] = [round(min(s_runs), 3), round(max(s_runs), 3)]
        spark_best[name] = min(s_runs)
        if d_runs:
            duck_timings[name] = round(sorted(d_runs)[len(d_runs) // 2], 3)
            duck_spread[name] = [round(min(d_runs), 3), round(max(d_runs), 3)]
            duck_best[name] = min(d_runs)

    # Companion pass under PRODUCTION session defaults (AQE on — the one
    # conf plans/session.py ships differently from this bench posture),
    # warmup + median-of-3 per query: keeps the cost of the bench-only
    # conf visible in every BENCH_r*.json instead of silently drifting.  SQL confs are
    # runtime-settable, so toggle-run-restore on the same session.
    # Why the drift is justified: SCALE_PROBE.json (scale_probe.py) shows
    # the AQE penalty shrinking from ~2.4x here to 1.10x at 10x the data,
    # with AQE ahead on the shuffle-heavy shapes — sub-second sf0.1
    # latency is the one regime where adaptive re-planning can't pay.
    bench_overrides = {
        "spark.sql.adaptive.enabled": "true",
    }
    saved = {k: spark.conf.get(k) for k in bench_overrides}
    for k, v in bench_overrides.items():
        spark.conf.set(k, v)
    # Same measurement discipline as the main pass: AQE produces different
    # physical plans, so the first run pays fresh whole-stage codegen
    # compilation — an untimed warmup keeps that out of the number, and a
    # per-query median-of-3 keeps one noisy-neighbor burst from defining
    # the recorded production posture (r6 single-pass swung 4.97→6.58 s
    # with no code change).
    for name in HEADLINE:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    prod_runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            df = queries[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            prod_runs[name].append(time.perf_counter() - t0)
    prod_total = sum(sorted(r)[1] for r in prod_runs.values())
    for k, v in saved.items():
        spark.conf.set(k, v)

    total = round(sum(timings.values()), 3)
    # Only report a ratio computed over the FULL headline set — if the
    # baseline died partway, a partial sum would bias vs_duckdb.
    duckdb_value = (
        round(sum(duck_timings.values()), 3)
        if len(duck_timings) == len(HEADLINE)
        else None
    )

    # The driver captures a bounded TAIL of stdout and parses the LAST
    # JSON line it finds: r8's enriched single line (per-query spreads for
    # both engines) outgrew that window and left BENCH_r08.json with
    # "parsed": null.  So the printed line stays SHORT — headline totals,
    # per-query medians, and the gate ratios only — and the bulky
    # diagnostic payload (spreads, best-of-7 per query, DuckDB medians)
    # goes to BENCH_DETAIL.json next to this script.
    detail = {
        # per-query [min, max] of the 7 runs: when min<<max the median is
        # contention-dominated and the headline ratio should be read
        # against vs_duckdb_best in the summary line
        "queries_spread": spark_spread,
        "queries_best": {k: round(v, 3) for k, v in spark_best.items()},
    }
    out = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        # warmup + per-query median-of-3 under production session defaults
        "production_conf_value": round(prod_total, 3),
        "value_best": round(sum(spark_best.values()), 3),
    }
    if duckdb_value is not None:
        out["duckdb_value"] = duckdb_value
        out["vs_duckdb"] = round(total / duckdb_value, 3)
        out["duckdb_value_best"] = round(sum(duck_best.values()), 3)
        # companion ratio on best-of-7 totals: symmetric and
        # contention-resistant (a noise burst inflates some runs but
        # rarely ALL 7 of a query on one engine)
        out["vs_duckdb_best"] = round(
            sum(spark_best.values()) / sum(duck_best.values()), 3
        )
        detail["duckdb_queries"] = duck_timings
        detail["duckdb_queries_spread"] = duck_spread
        detail["duckdb_queries_best"] = {
            k: round(v, 3) for k, v in duck_best.items()
        }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump({**out, **detail}, fh, indent=1)
        out["detail"] = "BENCH_DETAIL.json"
    except OSError:
        pass  # read-only checkout: the summary line still carries the gate
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

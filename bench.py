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
    spark = get_session(app_name="bench")
    queries = all_queries()

    # Warmup: touch every table (page cache) and exercise the shuffle /
    # window / explode machinery once so JIT+codegen costs aren't charged
    # to the first timed query.
    from cardano_analytics_duckdb_spark.lake.tables import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()
    queries["order_summary_stats"](spark, sf_dir).count()
    queries["top_orders_per_customer"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    queries["part_name_tokens"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

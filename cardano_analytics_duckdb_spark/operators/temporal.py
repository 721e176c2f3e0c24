"""Temporal join operators Spark lacks as builtins: as-of join, range join.

Extensions beyond the reference (SURVEY §2.3 notes their absence); both are
staples of time-series analytics (the reference's community wishlist —
"stake at a specific slot", /root/reference/README.md:130,142-145 — is an
as-of lookup).  DuckDB has native ``ASOF JOIN`` and fast theta joins, which
make exact oracles.

Scale design:

- **As-of join** is implemented as union → single shuffle by key → one
  window pass (``last(..., ignoreNulls)`` over rows-unbounded-preceding).
  This is the shape that holds at 100 TB: cost is one sort-shuffle of
  (left + right), versus the naive ``join + filter + row_number`` which
  materializes the full range-overlap product before pruning it.
- **Range self-join** banding: bucket timestamps to the band width, join on
  (key, bucket) and (key, bucket+1), filter exactly.  The candidate set is
  every pair at most one bucket apart — cost ∝ Σ bucket², never N².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ordering import small_sorted
from ..functions.rounding import rnd
from ..lake.tables import load_table

# -- as-of join: each click's most recent purchase (same user, ts <=) ---------


def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("is_right"),
        F.lit(None).cast("bigint").alias("p_event_id"),
        F.lit(None).cast("double").alias("p_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(1).alias("is_right"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    # At equal ts the purchase qualifies (>= semantics): order it first.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "user_id",
        "ts",
        "event_id",
        "is_right",
        F.last("p_event_id", ignorenulls=True).over(w).alias("last_purchase_id"),
        F.last("p_value", ignorenulls=True).over(w).alias("last_purchase_value"),
    )
    return (
        merged.filter(F.col("is_right") == 0)
        .select(
            "event_id",
            "user_id",
            # epoch ms, not a raw timestamp: collection of TIMESTAMP renders
            # in the session timezone, which the driver doesn't pin to UTC
            F.unix_millis("ts").alias("ts_ms"),
            "last_purchase_id",
            "last_purchase_value",
        )
        .orderBy("event_id")
    )


_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms,
       p.event_id AS last_purchase_id, p.value AS last_purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""

# -- banded range self-join: event pairs within 60 s per user -----------------

_BAND_S = 60


def events_within_minute_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gap is measured in truncated epoch-ms (mirroring the oracle's
    # ``epoch_ms(b) - epoch_ms(a)``) but the b-after-a predicate compares at
    # full microsecond precision, exactly like DuckDB's ``b.ts > a.ts``.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.unix_millis("ts").alias("ms"),
    )
    banded = ev.withColumn("bucket", F.floor(F.col("ms") / (_BAND_S * 1000)))
    # candidates: same bucket or b in a's next bucket (covers 0 <= dt <= 60 s)
    later = banded.select(
        F.col("user_id"),
        F.col("event_id").alias("event_b"),
        F.col("us").alias("us_b"),
        F.col("ms").alias("ms_b"),
        F.explode(
            F.array(F.col("bucket"), F.col("bucket") - 1)
        ).alias("bucket"),
    )
    pairs = (
        banded.alias("a")
        .join(
            later.alias("b"),
            on=["user_id", "bucket"],
        )
        .filter(
            (F.col("b.us_b") > F.col("a.us"))
            & (F.col("b.ms_b") - F.col("a.ms") <= _BAND_S * 1000)
        )
        .select(
            "user_id",
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_b").alias("event_b"),
            (F.col("b.ms_b") - F.col("a.ms")).alias("gap_ms"),
        )
    )
    return pairs.orderBy("user_id", "event_a", "event_b")


_WITHIN_SQL = f"""
SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
       epoch_ms(b.ts) - epoch_ms(a.ts) AS gap_ms
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND epoch_ms(b.ts) - epoch_ms(a.ts) <= {_BAND_S * 1000}
ORDER BY a.user_id, event_a, event_b
"""


# -- time-series gap filling --------------------------------------------------
# Dense hourly activity series per user: missing hours materialized with a
# zero count (the precondition for any rolling/forecast pass downstream).
# The grid is generated distributed — `sequence()` per user row then
# `explode`, so grid size scales with Σ per-user span and is produced where
# the user's rows live; no driver-side loop, no cross join against a global
# calendar.  DuckDB's `generate_series` lateral is the oracle mirror.
# Hour index = floor(epoch_ms / 3600000): pure int64 arithmetic, identical
# in both engines, immune to session timezone.


def user_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select(
            "user_id",
            F.floor(F.unix_millis("ts") / F.lit(3600000)).alias("hr"),
        )
    )
    counts = ev.groupBy("user_id", "hr").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
        .select(
            "user_id", F.explode(F.sequence("mn", "mx")).alias("hr")
        )
    )
    return (
        grid.join(counts, ["user_id", "hr"], "left")
        .select(
            "user_id",
            (F.col("hr") * F.lit(3600000)).alias("hour_ms"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .orderBy("user_id", "hour_ms")
    )


_GAPFILL_SQL = """
WITH ev AS (
  SELECT user_id, epoch_ms(ts) // 3600000 AS hr
  FROM events WHERE user_id < 20
),
counts AS (SELECT user_id, hr, count(*) AS n FROM ev GROUP BY user_id, hr),
spans AS (SELECT user_id, min(hr) AS mn, max(hr) AS mx FROM ev GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx)) AS hr FROM spans
)
SELECT g.user_id, g.hr * 3600000 AS hour_ms, coalesce(c.n, 0) AS n_events
FROM grid g
LEFT JOIN counts c ON c.user_id = g.user_id AND c.hr = g.hr
ORDER BY g.user_id, hour_ms
"""


# -- conversion funnel --------------------------------------------------------
# Product-analytics staple: per user, first click → first purchase AT OR
# AFTER that click → conversion within 30 minutes.  One hash shuffle on
# user_id serves both window passes AND the per-user collapse (same
# clustering, no re-exchange); the second window expression references the
# first's output, which stays in the same window stage.  The final stage is
# a 1-row global aggregate with map-side partials.  "First purchase after
# first click" is deliberately NOT min(purchase ts) overall — the funnel
# must not count purchases that preceded any click.


def user_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    fc = F.min(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    fp_after = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("fc")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        ev.withColumn("fc", fc)
        .withColumn("fp_after", fp_after)
        .groupBy("user_id")
        .agg(F.min("fc").alias("fc"), F.min("fp_after").alias("fp_after"))
    )
    clicked = F.col("fc").isNotNull()
    purchased = clicked & F.col("fp_after").isNotNull()
    converted = purchased & (
        F.unix_millis("fp_after") - F.unix_millis("fc") <= 30 * 60 * 1000
    )
    return per_user.agg(
        F.count(F.when(clicked, 1)).alias("n_users_clicked"),
        F.count(F.when(purchased, 1)).alias("n_purchased_after_click"),
        F.count(F.when(converted, 1)).alias("n_converted_30min"),
    )


_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN ts END) AS fc
  FROM events GROUP BY user_id
), enriched AS (
  SELECT u.user_id, u.fc,
         (SELECT min(ts) FROM events e
          WHERE e.user_id = u.user_id AND e.event_type = 'purchase'
            AND e.ts >= u.fc) AS fp_after
  FROM per_user u
)
SELECT count(CASE WHEN fc IS NOT NULL THEN 1 END) AS n_users_clicked,
       count(CASE WHEN fc IS NOT NULL AND fp_after IS NOT NULL
                  THEN 1 END) AS n_purchased_after_click,
       count(CASE WHEN fc IS NOT NULL AND fp_after IS NOT NULL
                   AND epoch_ms(fp_after) - epoch_ms(fc) <= 1800000
                  THEN 1 END) AS n_converted_30min
FROM enriched
"""


# -- weekly cohort retention --------------------------------------------------
# The cohort matrix: users grouped by their first active week, counted in
# each subsequent week they return.  The user_id window exchange also
# satisfies the (user_id, cohort, offset) dedup's clustering requirement
# (hash on a SUBSET of the dedup keys still co-locates equal tuples), so
# dropDuplicates adds no exchange; only the final small (cohort, offset)
# aggregate shuffles.

_WEEK_MS = 7 * 24 * 3600 * 1000


def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    base = ev.select(
        "user_id",
        F.floor(F.unix_millis("ts") / _WEEK_MS).cast("long").alias("wk"),
    )
    cohort = F.min("wk").over(Window.partitionBy("user_id"))
    return (
        base.withColumn("cohort_wk", cohort)
        .select(
            "user_id",
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).alias("week_offset"),
        )
        .dropDuplicates(["user_id", "cohort_wk", "week_offset"])
        .groupBy("cohort_wk", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .transform(small_sorted, "cohort_wk", "week_offset")
    )


_COHORT_SQL = f"""
WITH wk AS (
  SELECT user_id,
         CAST(floor(epoch_ms(ts) / {_WEEK_MS}) AS BIGINT) AS wk
  FROM events
), cohort AS (
  SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort_wk
  FROM wk
), dist AS (
  SELECT DISTINCT user_id, cohort_wk, wk - cohort_wk AS week_offset
  FROM cohort
)
SELECT cohort_wk, week_offset, count(*) AS n_active_users
FROM dist
GROUP BY cohort_wk, week_offset
ORDER BY cohort_wk, week_offset
"""


# -- fixed-width histogram ----------------------------------------------------
# Data-profiling staple: distribution of events.value in 5.0-wide bins.
# Bin assignment is narrow int arithmetic inside codegen; the aggregate
# shuffles one partial row per (partition, bin) — at 100 TB the exchange
# carries P×n_bins rows no matter how many events there are.


def event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bin_no = F.floor(F.col("value") / 5.0).cast("long")
    return (
        ev.select(bin_no.alias("bin_no"), "value")
        .groupBy("bin_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.min("value"), 2).alias("bin_min"),
            rnd(F.max("value"), 2).alias("bin_max"),
        )
        .transform(small_sorted, "bin_no")
    )


_HISTOGRAM_SQL = """
SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin_no,
       count(*) AS n_events,
       floor((min(value)) * 100.0 + 0.5) / 100.0 AS bin_min,
       floor((max(value)) * 100.0 + 0.5) / 100.0 AS bin_max
FROM events
GROUP BY bin_no
ORDER BY bin_no
"""


# -- per-type outlier detection -----------------------------------------------
# The anomaly-scan primitive of an event pipeline: per-type z-scores with
# outlier counts.  The per-type moments are ONE aggregate broadcast back
# over the fact scan (the decorrelated correlated-subquery shape) — the
# fact table streams through twice but never shuffles by anything except
# the tiny type key.  Boundary counts use |z| > 3 on doubles whose engines
# agree to ~1e-12 relative; the reported max is rounded for hash parity.


def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("value").alias("mean_v"),
        F.stddev_samp("value").alias("sd_v"),
    )
    az = F.abs((F.col("value") - F.col("mean_v")) / F.col("sd_v"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_type", "n_events", az.alias("az"))
        .groupBy("event_type", "n_events")
        .agg(
            F.count(F.when(F.col("az") > 3.0, F.lit(1))).alias("n_outliers"),
            rnd(F.max("az"), 4).alias("max_abs_z"),
        )
        .transform(small_sorted, "event_type")
    )


_OUTLIERS_SQL = """
WITH s AS (
  SELECT event_type, count(*) AS n_events,
         avg(value) AS mean_v, stddev_samp(value) AS sd_v
  FROM events GROUP BY event_type
)
SELECT e.event_type, s.n_events,
       count(*) FILTER (WHERE abs((e.value - s.mean_v) / s.sd_v) > 3.0)
           AS n_outliers,
       floor(max(abs((e.value - s.mean_v) / s.sd_v)) * 10000.0 + 0.5)
           / 10000.0 AS max_abs_z
FROM events e JOIN s USING (event_type)
GROUP BY e.event_type, s.n_events
ORDER BY event_type
"""


QUERIES = {
    "events_asof_purchase": events_asof_purchase,
    "events_within_minute_pairs": events_within_minute_pairs,
    "user_hourly_gapfill": user_hourly_gapfill,
    "user_conversion_funnel": user_conversion_funnel,
    "weekly_cohort_retention": weekly_cohort_retention,
    "event_value_histogram": event_value_histogram,
    "event_value_outliers": event_value_outliers,
}

ORACLE = {
    "event_value_outliers": _OUTLIERS_SQL,
    "events_asof_purchase": _ASOF_SQL,
    "events_within_minute_pairs": _WITHIN_SQL,
    "user_hourly_gapfill": _GAPFILL_SQL,
    "user_conversion_funnel": _FUNNEL_SQL,
    "weekly_cohort_retention": _COHORT_SQL,
    "event_value_histogram": _HISTOGRAM_SQL,
}

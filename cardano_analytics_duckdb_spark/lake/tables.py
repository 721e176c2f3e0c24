"""Readers for the driver's synthetic parquet tables and view registration.

Mirrors the reference's view-catalog pattern — one SQL view per table over a
discovered parquet file set (``_setup_views``,
/root/reference/token_fee_analysis.py:49-81) — as Spark temp views.  Unlike
the reference's glob-everything approach, `spark.read.parquet` keeps filter
and projection pushdown into the scan (SURVEY §4 R1/R4 are free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Warmed-table registry: (sf_dir, name) -> cached DataFrame.  Populated by
# ``warm_lake``; consulted by ``load_table`` so every operator transparently
# reads the in-memory columnar copy once a lake has been warmed.
_WARMED: dict[tuple[str, str], DataFrame] = {}


def warm_lake(
    spark: SparkSession,
    sf_dir: str,
    partitions: int | None = None,
    small_table_bytes: int = 262_144,
) -> None:
    """Repartition + cache every table of ``sf_dir`` in memory.

    Why: the driver's testdata files are single-row-group parquet, so a cold
    scan is one task no matter how many cores exist (parquet row groups are
    the unit of split).  Caching through an explicit ``repartition`` restores
    scan parallelism for every downstream query — the local analogue of a
    cluster keeping hot tables cached/bucketed across executors.

    At 100 TB you would warm only dimension tables and rely on partitioned
    scans (many files → many splits) for facts; this helper takes whatever
    fits, spilling to disk (MEMORY_AND_DISK is ``cache()``'s default for
    DataFrames).  Tables under ``small_table_bytes`` stay single-partition so
    broadcast-sized dims don't pay 32-task scheduling per stage.
    """
    from pyspark import __version__ as _  # noqa: F401  (documents pin intent)

    if partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        partitions = max(2, int(cpus) // 4) if cpus.isdigit() else 8
    for name in TESTDATA_TABLES:
        key = (sf_dir, name)
        if key in _WARMED:
            continue
        df = load_table(spark, sf_dir, name)
        size = os.path.getsize(os.path.join(sf_dir, f"{name}.parquet"))
        n = partitions if size > small_table_bytes else 1
        cached = df.repartition(n).cache()
        cached.count()  # materialize now so queries never pay the fill
        _WARMED[key] = cached


def unwarm_lake(sf_dir: str | None = None) -> None:
    """Drop warmed tables (all lakes, or just ``sf_dir``'s)."""
    for key in [k for k in _WARMED if sf_dir is None or k[0] == sf_dir]:
        _WARMED.pop(key).unpersist()


def bucket_lake(
    spark: SparkSession,
    sf_dir: str,
    specs: dict[str, tuple[str, ...]],
    n_buckets: int = 32,
) -> dict[str, str]:
    """Declare-and-build shorthand over the lake LAYOUT lifecycle
    (``lake/layout.py``): set each table's bucket spec to exactly the
    given key columns (replacing any prior layouts for that table) and
    materialize the copies.  ``load_table`` then serves them
    automatically while they stay fresh.  Returns {table: catalog name}.

    100 TB posture: co-located fact-fact joins are THE answer to the
    recurring-shuffle cost (measured: bucket_probe_100x join_speedup
    2.11x, breakeven ~14 joins); the persisted spec + signature-checked
    resolution is how the layout reaches queries without touching query
    code — and survives the session, unlike the r11 in-process registry.
    """
    from .layout import bucket_spec, bucketize, set_bucket_spec

    spec = bucket_spec(spark, sf_dir) or {"n_buckets": n_buckets, "tables": {}}
    tables = dict(spec["tables"])
    for name, cols in specs.items():
        tables[name] = [list(cols)]
    set_bucket_spec(spark, sf_dir, tables, n_buckets=n_buckets)
    built = bucketize(spark, sf_dir, tables=specs.keys())
    out: dict[str, str] = {}
    for name, cols in specs.items():
        out[name] = built[f"{name}_by_{'_'.join(cols)}"]
    return out


def sort_lake(
    spark: SparkSession,
    sf_dir: str,
    specs: dict[str, tuple[str, ...]],
    out_files: int = 64,
) -> None:
    """Declare-and-build shorthand for RANGE-CLUSTERED layouts
    (``lake/layout.py::set_sort_spec``): each table gets a copy whose
    files hold tight, disjoint ranges of the sort key, so bounded-key
    predicates row-group-skip instead of decoding the whole table
    (guide §6).  ``load_table`` serves the copies while fresh."""
    from .layout import bucketize, set_sort_spec

    set_sort_spec(
        spark,
        sf_dir,
        {name: list(cols) for name, cols in specs.items()},
        out_files=out_files,
    )
    bucketize(spark, sf_dir, tables=specs.keys())


def unbucket_lake(spark: SparkSession, sf_dir: str) -> None:
    """Drop ``sf_dir``'s layout (spec, copies, catalog entries);
    subsequent loads read the plain parquet again."""
    from .layout import drop_layout

    drop_layout(spark, sf_dir)


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    layout_for: tuple[str, ...] | None = None,
) -> DataFrame:
    """The default read path for testdata-lake tables.

    Resolution order: warmed in-memory copy, then a FRESH bucketed copy
    from the lake's declared layout (``lake/layout.py`` — ``layout_for``
    names the join/aggregation key the caller wants co-location on; no
    hint serves the table's primary layout), then the plain parquet.  A
    stale or absent layout silently falls through to plain — layouts are
    an optimization, never a correctness dependency."""
    warmed = _WARMED.get((sf_dir, name))
    if warmed is not None:
        return warmed
    from .layout import resolve_bucketed

    bucketed = resolve_bucketed(spark, sf_dir, name, layout_for)
    if bucketed is not None:
        return bucketed
    return load_plain_table(spark, sf_dir, name)


def load_plain_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The un-resolved parquet read (also the layout builder's source —
    building a copy must never read through a copy)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        raise FileNotFoundError(f"table {name!r} not found at {path}")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def events_ts_encoding(path: str) -> str:
    """Probe the parquet footer for the ``ts`` encoding: ``"nanos"``
    (TIMESTAMP(NANOS) — Spark's vectorized reader rejects it),
    ``"ntz"`` (micros/millis without UTC adjustment — surfaces as
    TIMESTAMP_NTZ), or ``"utc"`` (isAdjustedToUTC=true — surfaces as plain
    TIMESTAMP).

    The driver's testdata has drifted across regenerations (NANOS in rounds
    1-2, plain MICROS since round 3); a footer read (one file, driver-side,
    metadata only) decides the loader path — for BOTH the batch reader and
    the streaming source schema — instead of hardcoding any encoding.
    """
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not parts:
            return "ntz"
        probe = os.path.join(path, parts[0])
    # Physical type first: Spark's default writer emits INT96 timestamps,
    # which pyarrow ALSO surfaces as timestamp[ns] — but Spark reads its
    # own INT96 back as a plain (UTC-adjusted) TIMESTAMP, so classifying
    # by the arrow type alone would mis-route any events table WE wrote
    # (compacted/derived lakes) into the nanos workaround and break.
    pf = pq.ParquetFile(probe)
    for i in range(len(pf.schema)):
        col = pf.schema.column(i)
        if col.name == "ts":
            if col.physical_type == "INT96":
                return "utc"
            break
    t = pq.read_schema(probe).field("ts").type
    if str(t).startswith("timestamp[ns"):
        return "nanos"
    return "utc" if getattr(t, "tz", None) else "ntz"


def events_ts_is_nanos(path: str) -> bool:
    """Back-compat shim over :func:`events_ts_encoding`."""
    return events_ts_encoding(path) == "nanos"


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Load events with ``ts`` normalized to a session-TZ TIMESTAMP whatever
    the parquet encoding:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it
      ([PARQUET_TYPE_ILLEGAL]); read nanos as long, truncate to micros —
      DuckDB's ns→us cast semantics, so oracle comparisons stay bit-identical.
    - TIMESTAMP(MICROS/MILLIS) without UTC adjustment: surfaces as
      TIMESTAMP_NTZ; cast to TIMESTAMP (session TZ is UTC, matching DuckDB's
      naive timestamps bit-for-bit).
    """
    from pyspark.sql import functions as F

    if events_ts_is_nanos(path):
        # nanosAsLong only changes how otherwise-unreadable NANOS columns
        # surface, and is only set when such a file is actually present.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    df = spark.read.parquet(path)
    if df.schema["ts"].dataType.typeName() == "timestamp_ntz":
        df = df.withColumn("ts", _ntz_as_utc_instant("ts"))
    return df


def _ntz_as_utc_instant(col: str):
    """TIMESTAMP_NTZ → TIMESTAMP interpreting the naive value as UTC,
    independent of ``spark.sql.session.timeZone``.

    A plain ``cast(ntz AS timestamp)`` reads the wall time in the *session*
    zone — under the driver's vanilla (host-TZ) session that shifts every
    epoch the oracle compares against (DuckDB treats naive timestamps as
    UTC).  ``timestampdiff`` between two NTZ values is pure arithmetic, and
    ``timestamp_micros`` maps epoch micros to an instant; neither consults
    the session zone.
    """
    from pyspark.sql import functions as F

    return F.expr(
        "timestamp_micros(timestampdiff(MICROSECOND, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col}))"
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register one temp view per table (``{name}{suffix}``), like the
    reference's ``{t}_view`` catalog (token_fee_analysis.py:76-80)."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}{suffix}")

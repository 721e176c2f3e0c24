"""Differential-test harness: run a Spark query and its DuckDB oracle SQL on
the same parquet tables, canonicalize, and compare (SURVEY §5).

Mirrors what the driver's correctness gate does: column names sorted, rows
sorted, values normalized (floats rounded upstream by the queries
themselves), then compared cell-by-cell.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):  # also covers np.float64
        if math.isnan(v):
            return None
        # Tag floats so a float cell NEVER equals an int cell, even when
        # numerically equal.  The driver hashes `509234444.0` != `509234444`
        # (DuckDB promotes integer SUM to HUGEINT, which fetchdf() renders
        # as float64) — without the tag, pytest stayed green while the
        # driver's gate failed on exactly this class for two rounds.
        return ("float", round(v, 6))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # The driver's canonicalizer (pandas sort_values over all columns)
        # crashes on list cells — fail loudly here so no query ships an
        # array-typed output column that only breaks at driver time.
        raise TypeError(
            "array-typed output column reached the oracle harness; emit a "
            "'|'-joined sorted string (concat_ws / array_to_string) instead"
        )
    if isinstance(v, bytes):
        return v.hex()
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    actual = spark_df.toPandas()
    expected = con.execute(sql).fetchdf()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"column mismatch: spark={sorted(actual.columns)} "
        f"duckdb={sorted(expected.columns)}"
    )
    a = canonicalize(actual)
    e = canonicalize(expected)
    assert len(a) == len(e), f"row count: spark={len(a)} duckdb={len(e)}"
    for i, (ra, re_) in enumerate(zip(a, e)):
        assert ra == re_, f"row {i} differs:\n  spark ={ra}\n  duckdb={re_}"

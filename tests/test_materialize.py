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

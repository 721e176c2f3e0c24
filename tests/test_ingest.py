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
    dest, _ = ingested
    before = _canon_rows(spark.read.parquet(f"{dest}/tx"))
    n_files_before = len(glob.glob(f"{dest}/tx/slot_group=*/*.parquet"))
    compact_lake(spark, dest)
    after = _canon_rows(spark.read.parquet(f"{dest}/tx"))
    n_files_after = len(glob.glob(f"{dest}/tx/slot_group=*/*.parquet"))
    assert after == before
    n_groups = len(glob.glob(f"{dest}/tx/slot_group=*"))
    assert n_files_after == n_groups  # exactly one file per partition
    assert n_files_after < n_files_before

"""Exactly-once streaming corpus dedup (streaming/dedup.py): survivors,
cross-epoch dedup, null handling, crash replay."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cardano_analytics_duckdb_spark.streaming.dedup import (
    dedup_stream,
    read_deduped,
)

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_wave(spark, src, name, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    # file source picks up new files on the next trigger; append mode just
    # adds part files under the same dir
    del name


def _doc(i, text, source="web"):
    return (i, text, "en", source, len(text) if text is not None else 0)


def test_streaming_dedup_across_epochs(spark, tmp_path):
    src = str(tmp_path / "incoming")
    dest = str(tmp_path / "deduped")

    _write_wave(
        spark,
        src,
        "w0",
        [
            _doc(3, "alpha beta gamma"),
            _doc(1, "alpha beta gamma"),  # in-batch dup: min doc_id wins
            _doc(2, "delta epsilon"),
            _doc(4, None),
            _doc(5, None),  # null-text dup: sentinel fingerprint dedups it
        ],
    )
    dedup_stream(spark, src, dest)
    got = {r["doc_id"]: r["text"] for r in read_deduped(spark, dest).collect()}
    assert got == {1: "alpha beta gamma", 2: "delta epsilon", 4: None}

    _write_wave(
        spark,
        src,
        "w1",
        [
            _doc(6, "alpha beta gamma"),  # cross-epoch dup: dropped
            _doc(7, "zeta eta"),
            _doc(8, None),  # cross-epoch null dup: dropped
        ],
    )
    dedup_stream(spark, src, dest)
    got = {r["doc_id"] for r in read_deduped(spark, dest).collect()}
    assert got == {1, 2, 4, 7}


def test_streaming_dedup_crash_replay_is_exactly_once(spark, tmp_path):
    """Crash AFTER the epoch's data commit but BEFORE the checkpoint
    commit (delete the newest commits/ entry): the re-delivered epoch
    recomputes the same survivors and overwrites the same partition —
    the corpus equals a batch dedup of all input, with no duplicates and
    no lost documents."""
    src = str(tmp_path / "incoming")
    dest = str(tmp_path / "deduped")

    _write_wave(
        spark, src, "w0", [_doc(1, "one two three"), _doc(2, "four five")]
    )
    dedup_stream(spark, src, dest)
    _write_wave(
        spark,
        src,
        "w1",
        [_doc(3, "four five"), _doc(4, "six seven"), _doc(5, "six seven")],
    )
    dedup_stream(spark, src, dest)

    commits = sorted(
        p
        for p in glob.glob(os.path.join(dest, "_checkpoint_dedup", "commits", "*"))
        if not p.endswith(".tmp")
    )
    latest = commits[-1]
    os.remove(latest)
    crc = os.path.join(
        os.path.dirname(latest), f".{os.path.basename(latest)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)

    dedup_stream(spark, src, dest)  # re-delivers the lost epoch

    deduped = read_deduped(spark, dest)
    assert {r["doc_id"] for r in deduped.collect()} == {1, 2, 4}
    # fingerprints unique — the invariant the operator maintains
    data = spark.read.parquet(os.path.join(dest, "data"))
    n_fps = data.select("_fp").distinct().count()
    assert data.count() == n_fps
    # equals the batch recompute (min doc_id per distinct text)
    batch = (
        spark.read.parquet(src)
        .groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    assert {r["doc_id"] for r in batch.collect()} == {1, 2, 4}

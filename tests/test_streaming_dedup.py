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


_BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
# pinned fixture facts (asserted in the test): _BASE vs _NEAR collide in a
# MinHash band; _BASE vs _FAR do not
_NEAR = _BASE.replace("today", "tonight")
_FAR = _BASE.replace("quick", "swift")


def test_near_dup_suppression_across_epochs(spark, tmp_path):
    from cardano_analytics_duckdb_spark.operators.dedup import _minhash_bands
    from cardano_analytics_duckdb_spark.streaming.dedup import (
        near_dup_suppress_stream,
        read_survivors,
    )

    # pin the banding facts the scenario depends on, so a future change to
    # the minhash parameters fails HERE with a clear message instead of
    # silently flipping the suppression assertions below
    bands = _minhash_bands(
        spark.createDataFrame(
            [(1, _BASE), (2, _NEAR), (3, _FAR)], "doc_id long, text string"
        )
    )
    coll = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            ["band", "band_key"],
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .collect()
    )
    pairs = {(r[0], r[1]) for r in coll}
    assert (1, 2) in pairs and (1, 3) not in pairs and (2, 3) not in pairs

    src = str(tmp_path / "incoming")
    dest = str(tmp_path / "curated")
    _write_wave(
        spark,
        src,
        "w0",
        [
            _doc(1, _BASE),
            _doc(2, _BASE),  # exact dup: all bands collide -> suppressed
            _doc(3, "tiny"),  # shingle-less: passes through
        ],
    )
    near_dup_suppress_stream(spark, src, dest)
    assert {r["doc_id"] for r in read_survivors(spark, dest).collect()} == {1, 3}

    _write_wave(
        spark,
        src,
        "w1",
        [
            _doc(5, _NEAR),  # near-dup of epoch-0 survivor -> suppressed
            _doc(6, _FAR),  # different enough: no shared bucket -> survives
        ],
    )
    near_dup_suppress_stream(spark, src, dest)
    assert {r["doc_id"] for r in read_survivors(spark, dest).collect()} == {
        1, 3, 6,
    }


def test_near_dup_suppression_crash_replay(spark, tmp_path):
    from cardano_analytics_duckdb_spark.streaming.dedup import (
        near_dup_suppress_stream,
        read_survivors,
    )

    src = str(tmp_path / "incoming")
    dest = str(tmp_path / "curated")
    _write_wave(spark, src, "w0", [_doc(1, _BASE)])
    near_dup_suppress_stream(spark, src, dest)
    _write_wave(spark, src, "w1", [_doc(2, _NEAR), _doc(3, _FAR)])
    near_dup_suppress_stream(spark, src, dest)

    commits = sorted(
        p
        for p in glob.glob(
            os.path.join(dest, "_checkpoint_near_dup", "commits", "*")
        )
        if not p.endswith(".tmp")
    )
    latest = commits[-1]
    os.remove(latest)
    crc = os.path.join(
        os.path.dirname(latest), f".{os.path.basename(latest)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    near_dup_suppress_stream(spark, src, dest)  # replay the lost epoch

    got = [r["doc_id"] for r in read_survivors(spark, dest).collect()]
    assert sorted(got) == [1, 3]  # no duplicates, no losses
    # claims table holds exactly the survivors' bands, once each
    bands = spark.read.parquet(os.path.join(dest, "bands"))
    assert bands.count() == bands.select("band", "band_key").distinct().count()

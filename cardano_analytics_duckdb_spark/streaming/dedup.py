"""Exactly-once streaming corpus dedup (dedup-at-ingest).

Batch dedup (``operators/dedup.py``) rescans the corpus it dedups.  At
100 TB the economical shape is dedup AT INGEST: each arriving micro-batch
keeps only documents whose content fingerprint has never been seen, and
the corpus stays duplicate-free by construction — no periodic full-corpus
job.  This module is that operator for an append-only document stream.

Exactly-once without snapshots: survivors of epoch N land in
``data/epoch=N`` via dynamic partition overwrite.  foreachBatch may
re-deliver an epoch after a crash (write committed, checkpoint commit
lost), but the replay recomputes the SAME survivor set — the in-batch
survivor choice is deterministic (min ``id_col`` per fingerprint, never
``dropDuplicates``'s arbitrary row), and the seen-set is derived from
epochs ``< N`` only, all committed and immutable — so the overwrite
replaces the partition with identical rows.  The checkpoint and
``data/`` live and die together (same contract as
``materialize_aggregate``): deleting one without the other restarts
epoch numbering over existing partitions.

Seen-set plumbing: the fingerprint column of the already-written table
itself, read back with column pruning (one string column) into a
left-anti join.  At 100 TB that join shuffles |corpus| fingerprints per
epoch; the production upgrade keeps the same semantics behind a compacted
fingerprint index plus a broadcast Bloom prefilter so only
probable-duplicates reach the join.  State never lives on the driver and
never in the streaming state store — the table IS the state, which is
what makes the replay reasoning above checkable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lake.fsutil import LakeFs
from .runner import has_epoch_partitions, run_available_now

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def dedup_stream(
    spark: SparkSession,
    src_glob: str,
    dest: str,
    *,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Drain every unseen file under ``src_glob``, appending only
    never-seen-before documents to ``dest/data``; returns the data path.

    Fingerprint is ``md5(text_col)`` (exact content dedup — the same
    portable hash the batch operators use); survivor per fingerprint is
    the minimum ``id_col``.  Read the result back with
    :func:`read_deduped`.
    """
    data = os.path.join(dest, "data")
    lfs = LakeFs(spark, dest)
    stream = spark.readStream.schema(schema).parquet(src_glob)

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        # NULL text gets a sentinel fingerprint: a null _fp would never
        # match in the anti-join (NULL = NULL is NULL), so null-text docs
        # would re-append every epoch instead of deduping to one.
        batch = batch_df.withColumn(
            "_fp", F.coalesce(F.md5(F.col(text_col)), F.lit("__null__"))
        )
        w = Window.partitionBy("_fp").orderBy(id_col)
        batch = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if has_epoch_partitions(lfs, data):
            seen = (
                spark.read.parquet(data)
                # epoch N's own partial rows from a crashed attempt must
                # not count as "seen" or the replay would drop everything
                # it previously wrote and lose those documents
                .filter(F.col("epoch") < epoch_id)
                .select("_fp")
            )
            batch = batch.join(seen, "_fp", "left_anti")
        (
            batch.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(data)
        )

    run_available_now(
        stream, os.path.join(dest, "_checkpoint_dedup"), write_epoch
    )
    return data


def read_deduped(spark: SparkSession, dest: str) -> DataFrame:
    """The deduplicated corpus without the bookkeeping columns."""
    return spark.read.parquet(os.path.join(dest, "data")).drop("_fp", "epoch")


# -- near-duplicate suppression at ingest -------------------------------------
# The exact-fingerprint stream above only stops byte-identical copies; web
# corpora mostly re-deliver NEAR-duplicates (boilerplate edits, tracking
# params, re-crawls).  This operator suppresses those at ingest with the
# SAME MinHash banding the batch dedup family uses (operators/dedup.py):
# a document is suppressed when any of its band buckets was already
# claimed by an earlier SURVIVOR — in this batch (smaller doc_id) or in a
# committed earlier epoch.
#
# Semantics (deterministic and parallel, documented over-suppression):
# per bucket the in-batch winner is the minimum doc_id; a doc survives
# iff it wins every bucket it occupies and none of its buckets carries a
# prior-epoch claim.  A doc can be suppressed by a doc that was itself
# suppressed (chain) — conservative, recall-oriented curation: the
# smallest doc of every near-dup cluster always survives, and suppressed
# docs claim nothing, so their unseen buckets stay open for future docs.
# Shingle-less docs (< 3 tokens) carry no bands and pass through.
#
# Exactly-once: the same epoch-partition argument as dedup_stream — both
# data/ and the claimed-bucket table bands/ are epoch-partitioned dynamic
# overwrites, survivors are a pure function of (batch, committed epochs
# < N), so a replay rewrites identical rows.  At 100 TB the prior-claims
# side is a two-narrow-column scan joined by (band, band_key) — the same
# bounded-bucket shape as the batch path, with a Bloom prefilter as the
# production upgrade.


def near_dup_suppress_stream(
    spark: SparkSession,
    src_glob: str,
    dest: str,
    *,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    id_col: str = "doc_id",
) -> str:
    """Drain unseen files under ``src_glob``, appending only documents
    that are not MinHash-band near-duplicates of earlier survivors;
    returns the data path.  Read back with :func:`read_survivors`."""
    from ..operators.dedup import _minhash_bands

    data = os.path.join(dest, "data")
    bands_tbl = os.path.join(dest, "bands")
    lfs = LakeFs(spark, dest)
    stream = spark.readStream.schema(schema).parquet(src_glob)

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df
        bands = _minhash_bands(
            batch.select(F.col(id_col).alias("doc_id"), "text")
        ).withColumnRenamed("doc_id", "_bid")
        suppressed_prior = (
            bands.join(
                spark.read.parquet(bands_tbl).filter(
                    F.col("epoch") < epoch_id
                ),
                ["band", "band_key"],
            ).select("_bid")
            if has_epoch_partitions(lfs, bands_tbl)
            else bands.select("_bid").limit(0)
        )
        bucket_min = bands.groupBy("band", "band_key").agg(
            F.min("_bid").alias("_w")
        )
        suppressed_batch = (
            bands.join(bucket_min, ["band", "band_key"])
            .filter(F.col("_bid") > F.col("_w"))
            .select("_bid")
        )
        suppressed = suppressed_prior.union(suppressed_batch).distinct()
        survivors = batch.join(
            suppressed, batch[id_col] == suppressed["_bid"], "left_anti"
        )
        (
            survivors.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(data)
        )
        (
            bands.join(
                survivors.select(F.col(id_col).alias("_bid")), "_bid"
            )
            .select("band", "band_key")
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(bands_tbl)
        )

    run_available_now(
        stream, os.path.join(dest, "_checkpoint_near_dup"), write_epoch
    )
    return data


def read_survivors(spark: SparkSession, dest: str) -> DataFrame:
    """The near-dup-suppressed corpus without the bookkeeping column."""
    return spark.read.parquet(os.path.join(dest, "data")).drop("epoch")

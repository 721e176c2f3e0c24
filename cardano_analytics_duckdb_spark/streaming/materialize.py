"""Incrementally-maintained materialized aggregate (streaming + merge).

The 100 TB pattern this demonstrates: a per-key aggregate table kept
current by a stream, where each micro-batch only touches the key-bucket
partitions its delta hits — never a full recompute, never a full rewrite.
``foreachBatch`` composes the batch engine's merge machinery (the same
dynamic partition-overwrite as ``lake.upsert``) with Structured Streaming's
exactly-once epochs: the checkpoint guarantees each input file is folded in
exactly once, so the materialized counts equal the batch aggregate of
everything ingested, at any point between epochs.

Scale posture: the per-epoch work is (delta hash-agg) + (read ONLY the
touched buckets) + (bucket-scoped rewrite) — cost ∝ delta size and bucket
fan-out, not table size.  Buckets are hash partitions of the key space, so
skewed deltas spread; raise ``n_buckets`` with key cardinality.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def materialize_user_counts(
    spark: SparkSession, src_dir: str, dest: str, n_buckets: int = 16
) -> str:
    """Fold every unseen events file under ``src_dir`` into the
    ``dest/user_counts`` aggregate table; returns the table path."""
    table = os.path.join(dest, "user_counts")
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)

    def upsert_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        delta = (
            batch_df.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
            )
            .withColumn(
                "bucket", (F.col("user_id") % n_buckets).cast("int")
            )
        )
        if glob.glob(os.path.join(table, "bucket=*")):
            touched = [
                r[0] for r in delta.select("bucket").distinct().collect()
            ]
            prev = spark.read.parquet(table).filter(
                F.col("bucket").isin(touched)
            )
            # prev covers EVERY key of the touched buckets, so the additive
            # combine is a complete replacement for exactly those buckets
            combined = (
                prev.unionByName(delta)
                .groupBy("user_id", "bucket")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("total_value").alias("total_value"),
                )
            )
        else:
            combined = delta
        (
            combined.localCheckpoint()
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(table)
        )

    q = (
        stream.writeStream.foreachBatch(upsert_epoch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(dest, "_checkpoint"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return table

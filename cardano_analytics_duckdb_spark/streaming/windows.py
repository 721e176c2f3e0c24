"""Structured Streaming windowed aggregations over the ``events`` table.

The streaming surface the reference lacks (SURVEY §2.9 notes no watermarks/
windows exist there; its ingest loop is the only stream).  Here: a real
``readStream`` → watermark → tumbling window → sink pipeline, replayable on
bounded parquet so it is testable offline and oracle-checkable — on bounded
replay with complete output, the result equals the batch tumbling-window
aggregation, so the same DuckDB SQL verifies it.

Scale notes: event-time windows + watermark bound state size; the grouped
aggregation shuffles once on (window, event_type).  On a real cluster the
same query runs against kafka/files with `Trigger.ProcessingTime` and RocksDB
state store; nothing in the plan is local-mode-specific.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.rounding import rnd

_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (bounded replay source)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling windows per event_type, via an actual streaming
    query drained to completion; returns the final (batch) result.

    Matches the batch ``events_tumbling_5min`` oracle: Spark's window() is
    epoch-aligned, so window.start == floor(epoch_ms/300000)*300000.
    """
    agg = (
        streaming_events(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            rnd(F.sum("value"), 2).alias("total_value"),
        )
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"""
        SELECT unix_millis(window.start) AS bucket_start_ms,
               event_type, n, total_value
        FROM {name}
        ORDER BY bucket_start_ms, event_type
        """
    )


_STREAM_TUMBLING_SQL = """
SELECT (epoch_ms(ts) // 300000) * 300000 AS bucket_start_ms,
       event_type,
       count(*) AS n,
       floor((sum(value)) * 100.0 + 0.5) / 100.0 AS total_value
FROM events
GROUP BY bucket_start_ms, event_type
ORDER BY bucket_start_ms, event_type
"""


def stream_ingest_foreach_batch(
    spark: SparkSession, sf_dir: str, dest: str | None = None
) -> DataFrame:
    """foreachBatch sink pattern (T2/T4): stream → per-epoch partitioned
    parquet appends, the Structured-Streaming shape of the reference's
    flush loop (ogmios_parquet.py:748-755).  Returns the written rows."""
    dest = dest or os.path.join("/tmp", f"events_sink_{uuid.uuid4().hex[:8]}")

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn(
                "day", F.date_trunc("day", F.col("ts")).cast("date")
            )
            .write.mode("append")
            .partitionBy("day")
            .parquet(dest)
        )

    q = (
        streaming_events(spark, sf_dir)
        .writeStream.foreachBatch(write_epoch)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(dest)


QUERIES = {
    "streaming_tumbling_counts": streaming_tumbling_counts,
}

ORACLE = {
    "streaming_tumbling_counts": _STREAM_TUMBLING_SQL,
}

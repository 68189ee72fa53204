"""Structured Streaming operators: windowed aggregation with watermarks
over the events stream, and a streaming triple-extraction pipeline.

The reference has no event-time semantics (its streams are snapshot
replacements); these are the north-star additions for Kafka-style
logical sources (rmls: vocab, /root/reference/src/voc.ts:26-34).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts/sums per event type with late-data
    watermarking. Works on both batch and streaming DataFrames (the
    batch view is the oracle for the streaming one)."""
    # parquet timestamps arrive as TIMESTAMP_NTZ; event-time watermarks
    # require TIMESTAMP (session-TZ) — cast on both paths so batch and
    # streaming stay value-identical (session TZ pinned to UTC).
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window_duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    parquet_dir: str,
    schema,
    query_name: str = "stream_out",
) -> DataFrame:
    """Drive the windowed aggregation as a real streaming query over a
    parquet directory source, synchronously to completion (memory sink) —
    the local harness for the Kafka-shaped deployment."""
    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")

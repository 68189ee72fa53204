"""Streaming deduplication: first-arrival-wins exact dedup with
watermark-BOUNDED state.

The batch dedup family (operators/dedup.py) assumes a finite corpus; a
Kafka/LDES-style ingest stream needs the same semantics with state that
does not grow forever. ``dropDuplicatesWithinWatermark`` keeps one state
row per key only within the event-time horizon — at web scale an
unbounded ``dropDuplicates`` on a stream would accumulate a state row
per distinct document for the lifetime of the query, which is exactly
the failure mode this wrapper exists to prevent (the reference has no
event-time semantics at all; its streams are snapshot replacements,
/root/reference/src/rml/rml.ts:276-404).

Batch DataFrames take the plain ``dropDuplicates`` path, so the same
call is its own oracle: run it over the stream's input files as a batch
frame and compare (tests/test_streaming.py::test_streaming_exact_dedup
does exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    key_cols: tuple[str, ...] = ("content_hash",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first arrival per key. Streaming: event-time watermark +
    ``dropDuplicatesWithinWatermark`` (bounded state — a key recurring
    AFTER the horizon is treated as new, the standard streaming-ingest
    contract); batch: ``dropDuplicates`` over the same key columns.

    Duplicates must share their non-key column values for batch==stream
    value equality (true for content-addressed keys like md5(text))."""
    src = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if docs.isStreaming:
        return src.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return src.dropDuplicates(list(key_cols))


def content_keyed(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: stamp the content-address key (md5 of the exact
    bytes) used by the batch exact-dedup operator, so streaming and
    batch pipelines dedup on identical keys."""
    return docs.withColumn("content_hash", F.md5(F.col(text_col)))

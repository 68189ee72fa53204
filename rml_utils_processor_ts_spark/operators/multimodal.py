"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``
stages.

The container has no image/audio codecs, so the decode kernel is STUBBED
(clearly-marked NotImplementedError with a deterministic fake fallback);
everything Spark-side — schema, batch iteration, partitioning, UDF
signatures — is real and tested. Swapping the stub for PIL/torchaudio is
a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, content_hash string, "
    "feature array<double>"
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text corpus as a media table: payload = UTF-8 bytes standing
    in for an encoded image; metadata derived deterministically."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        (F.pmod(F.col(id_col), F.lit(640)) + 1).cast("int").alias("width"),
        (F.pmod(F.col(id_col), F.lit(480)) + 1).cast("int").alias("height"),
        (F.length(F.col(text_col)) * 10).cast("int").alias("duration_ms"),
    )


def decode_media(payload: bytes, media_type: str):
    """REAL-DECODER STUB: PIL/torchaudio/pyav are not in this container.

    Raises NotImplementedError when a real decode is requested; callers
    use ``deterministic_fake_decode`` in tests/benchmarks."""
    raise NotImplementedError(
        f"no codec for {media_type} in this environment — plug PIL/torchaudio here"
    )


def deterministic_fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-feature vector: 8 means over
    byte strides. Pure function of the payload bytes."""
    if not payload:
        return [0.0] * 8
    n = len(payload)
    stride = max(n // 8, 1)
    out = []
    for k in range(8):
        chunk = payload[k * stride : (k + 1) * stride] or payload[-stride:]
        out.append(round(sum(chunk) / max(len(chunk), 1) / 255.0, 6))
    return out


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column
    (mapInPandas — the pattern a real image/audio pipeline uses; each
    pandas batch would go to the GPU/codec in one call)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = pdf["payload"].map(deterministic_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame timestamp
    (builtin sequence/explode — the decode itself is the stubbed kernel).
    Partitioning note: explode multiplies rows ~duration/every_ms; the
    repartition after keeps partitions balanced for the decode stage."""
    frames = media.filter(F.col("media_type") == "video/mp4").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)))
        ).alias("frame_idx"),
    )
    return frames.withColumn("frame_ts_ms", F.col("frame_idx") * every_ms).repartition("media_id")

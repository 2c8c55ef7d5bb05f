"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery (schema, batching, partition sizing, UDF
signatures) is real and tested; the actual media decode is STUBBED — the
container has no image/audio libraries — behind `decoder=` hooks. A
deterministic fake decoder exercises the full path in tests.

Design:
- media rows are (id, media_type, content binary, metadata map-ish cols).
- decode/feature steps run via mapInPandas so one Arrow batch streams
  through Python at a time (bounded memory per task, no collect).
- binary payloads are heavy: all transforms project id+content only and
  join features back by id, so wide metadata never rides the Python hop.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), True),   # image|audio|video
    StructField("mime", StringType(), True),
    StructField("content", BinaryType(), True),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("duration_ms", LongType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("feature", ArrayType(FloatType()), True),
    StructField("n_bytes", LongType(), True),
])


def real_decode_stub(content: bytes) -> np.ndarray:
    """Placeholder for a real decoder (PIL/torchaudio/ffmpeg)."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; pass decoder=fake_decode for the deterministic fake"
    )


def fake_decode(content: bytes) -> np.ndarray:
    """Deterministic fake decode: bytes -> pseudo feature vector. Keeps the
    whole Spark path executable without media libs."""
    if content is None:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(content, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(8, dtype=np.float32)
    pads = -len(arr) % 8
    arr = np.pad(arr, (0, pads)).reshape(-1, 8)
    return (arr.mean(axis=0) / 255.0).astype(np.float32)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = real_decode_stub,
    batch_size: int = 256,
) -> DataFrame:
    """media (MEDIA_SCHEMA-ish) -> FEATURE_SCHEMA via mapInPandas.

    Only (media_id, content) crosses into Python; Arrow batch size is capped
    so a partition of large blobs never materializes at once.
    """
    slim = media.select("media_id", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo:lo + batch_size]
                feats = [decoder(c) for c in chunk["content"]]
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].to_numpy(),
                    "feature": [np.asarray(f, dtype=np.float32) for f in feats],
                    "n_bytes": [len(c) if c is not None else 0
                                for c in chunk["content"]],
                })

    return slim.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) —
    the decode itself is the stubbed step, but the fan-out (explode over a
    sequence bounded by duration) is the real Spark shape."""
    return media.where(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0),
                       F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                       F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation: count/bytes per media_type."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length(F.col("content"))).alias("total_bytes"),
        F.avg(F.col("width")).alias("avg_width"),
    )

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real (schema, mapInPandas batch shape, metadata
projection); the codec step is stubbed behind a deterministic fake because
the image/audio libraries are not in this container — swap `_decode_stub`
for a real decoder (PIL/torchaudio) on a cluster with the libs installed.

Reference analog: page images are opaque payloads resized/encoded before
send (core/utils.py:13-15, 49-53; ds.py:135-136, 206-210).
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image | audio | video
    T.StructField("payload", T.BinaryType(), True),    # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake feature extraction (real decode needs PIL etc.).

    Produces an 8-dim byte-histogram feature — stable, testable plumbing.
    Replace with a real decode (NotImplementedError guard kept explicit).
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown media kind: {kind}")
    buckets = [0] * 8
    for b in payload or b"":
        buckets[b >> 5] += 1
    total = max(1, len(payload or b""))
    return [round(c / total, 6) for c in buckets]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of binary payloads in,
    fixed-width float features out. Partition-parallel, no shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p or b"") for p in pdf["payload"]],
                "feature": [_decode_stub(p, k)
                            for p, k in zip(pdf["payload"], pdf["kind"])],
            })
    cols = media.select("media_id", "kind", "payload")
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_dims(media: DataFrame, max_size: int = 2048) -> DataFrame:
    """Resize planning (reference core/utils.py:49-53: bound images to a
    max_size square, preserving aspect ratio; never upscale). Pure
    arithmetic projection — the actual pixel resample is the stubbed codec
    step; the dims computation is the part that must be exact."""
    w, h = F.col("width"), F.col("height")
    longest = F.greatest(w, h)
    scale = F.when(longest > max_size, F.lit(max_size) / longest) \
             .otherwise(F.lit(1.0))
    return media.select(
        "media_id", "width", "height",
        F.floor(w * scale).cast("int").alias("new_width"),
        F.floor(h * scale).cast("int").alias("new_height"),
        (longest > max_size).alias("resized"))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode one row per planned frame
    timestamp (native sequence — the decode itself is the stubbed step)."""
    return (media.filter(F.col("kind") == "video")
            .withColumn("frame_ts_ms",
                        F.explode(F.sequence(
                            F.lit(0),
                            F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1,
                                       F.lit(0)),
                            F.lit(every_ms))))
            .select("media_id", "frame_ts_ms", "mime"))

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real (schema, mapInPandas batch shape, metadata
projection), and so is the header-level decode: container sniff + pixel
dims are parsed from the REAL payload bytes (core/imagehdr.py — pure
Python, no PIL needed). Only the pixel resample / waveform decode remains
stubbed (the imaging/audio libraries are not in this container); the
byte-histogram feature stands in for content features behind the same
mapInPandas seam a real extractor would use.

Reference analog: page images are opaque payloads resized/encoded before
send (core/utils.py:13-15, 49-53; ds.py:135-136, 206-210), decoded with
PIL/pdf2image (core/utils.py:84-96).
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docext_spark.core import imagehdr

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
    T.StructField("format", T.StringType(), True),     # sniffed container
    T.StructField("width", T.IntegerType(), True),     # decoded from bytes
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def _byte_histogram(payload: bytes) -> list[float]:
    """Deterministic 8-bin byte histogram — the stand-in content feature
    (a real extractor would decode pixels/waveforms here; the libs are not
    in this container, so the seam is exercised with a feature that is
    cheap, stable, and testable)."""
    buckets = [0] * 8
    for b in payload or b"":
        buckets[b >> 5] += 1
    total = max(1, len(payload or b""))
    return [round(c / total, 6) for c in buckets]


def _decode(payload: bytes, kind: str):
    """Header-level decode on real bytes: (format, width, height). Unknown
    media kinds fail loudly; undecodable payloads yield nulls (a 100TB
    scan must never die on one corrupt blob — filter on format IS NULL)."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown media kind: {kind}")
    parsed = imagehdr.parse_dims(payload)
    return parsed if parsed else (None, None, None)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas perception: Arrow batches of binary payloads in; sniffed
    format + dims decoded from the real header bytes + fixed-width features
    out. Partition-parallel, no shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode(p, k)
                       for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "format": [d[0] for d in decoded],
                "width": pd.array([d[1] for d in decoded], dtype="Int32"),
                "height": pd.array([d[2] for d in decoded], dtype="Int32"),
                "n_bytes": [len(p or b"") for p in pdf["payload"]],
                "feature": [_byte_histogram(p) for p in pdf["payload"]],
            })
    cols = media.select("media_id", "kind", "payload")
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


def png_dims_native(payload: Column) -> Column:
    """struct<width int, height int> decoded from PNG bytes with NATIVE
    expressions only (substring on binary → hex → base-16 conv): the
    scan-time hot path stays inside whole-stage codegen, no Python worker.
    PNG mandates IHDR first, so width/height are big-endian u32 at fixed
    offsets 16/20 (1-based 17/21). Non-PNG payloads decode to null."""
    # full twin of core.imagehdr.png_dims: signature AND IHDR-first-chunk
    # AND positive dims — a PNG-signature payload with a junk first chunk
    # must decode to null, not to whatever u32s sit at the offsets
    is_png = ((F.hex(F.substring(payload, 1, 8)) == "89504E470D0A1A0A")
              & (F.hex(F.substring(payload, 13, 4)) == "49484452"))
    def be_u32(pos: int) -> Column:
        return F.conv(F.hex(F.substring(payload, pos, 4)), 16, 10).cast("int")
    w, h = be_u32(17), be_u32(21)
    return F.when(is_png & (w > 0) & (h > 0),
                  F.struct(w.alias("width"), h.alias("height")))


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

"""Streaming exact dedup: first arrival kept, dups dropped across
microbatches, state bounded by the watermark, checkpoint resume."""
from __future__ import annotations

import datetime as dt

from docext_spark.streaming.dedup_stream import dedup_stream

SCHEMA = "doc_id int, text string, ts timestamp"


def _df(spark, rows):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    return spark.createDataFrame(
        [(i, t, base + dt.timedelta(minutes=m)) for i, t, m in rows], SCHEMA)


def test_stream_dedup_first_arrival_and_resume(spark, tmp_path):
    in_dir, ckpt, out_dir = (str(tmp_path / d) for d in ("in", "ckpt", "out"))

    # batch 1: one dup inside the batch (normalized-equal), one unique
    _df(spark, [(1, "hello world", 0),
                (2, "  HELLO   world ", 1),     # normalized dup of 1
                (3, "something else", 2)]) \
        .coalesce(1).write.mode("append").parquet(in_dir)
    out1 = dedup_stream(spark, in_dir, SCHEMA, ckpt, out_dir)
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    assert ids1 == [1, 3]  # first arrival per fingerprint

    # batch 2 (same checkpoint): a cross-batch dup within the watermark
    # horizon is dropped; a genuinely new doc passes
    _df(spark, [(4, "hello world", 10),         # dup of 1, 10 min later
                (5, "brand new text", 11)]) \
        .coalesce(1).write.mode("append").parquet(in_dir)
    out2 = dedup_stream(spark, in_dir, SCHEMA, ckpt, out_dir)
    ids2 = sorted(r["doc_id"] for r in out2.collect())
    assert ids2 == [1, 3, 5]  # 4 deduped ACROSS the restart (state in ckpt)

    # every surviving row carries its fingerprint column for downstream joins
    assert "fp" in out2.columns
    assert out2.filter("fp is null").count() == 0

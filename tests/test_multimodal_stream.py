"""Multimodal plumbing + streaming metrics feed."""
from __future__ import annotations

from pyspark.sql import functions as F


def test_multimodal_feature_shape(spark):
    from docext_spark.operators.multimodal import extract_features
    media = spark.createDataFrame(
        [(1, "image", b"\x00\xff\x10"), (2, "audio", b""), (3, "video", None)],
        "media_id long, kind string, payload binary")
    out = extract_features(media).collect()
    assert len(out) == 3
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 3
    assert len(by_id[1]["feature"]) == 8
    assert abs(sum(by_id[1]["feature"]) - 1.0) < 1e-4
    assert by_id[3]["n_bytes"] == 0


def test_resize_dims(spark):
    from docext_spark.operators.multimodal import resize_dims
    media = spark.createDataFrame(
        [(1, 4096, 2048), (2, 1000, 500), (3, 100, 4000)],
        "media_id long, width int, height int")
    got = {r["media_id"]: r for r in resize_dims(media, 2048).collect()}
    assert (got[1]["new_width"], got[1]["new_height"]) == (2048, 1024)
    assert got[1]["resized"] is True
    assert (got[2]["new_width"], got[2]["new_height"]) == (1000, 500)
    assert got[2]["resized"] is False  # never upscale
    assert got[3]["new_height"] == 2048 and got[3]["new_width"] == 51


def test_frame_sample_plan(spark):
    from docext_spark.operators.multimodal import frame_sample_plan
    media = spark.createDataFrame(
        [(1, "video", None, "video/mp4", None, None, 3500)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int")
    out = frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in out] == [0, 1000, 2000, 3000]


def test_streaming_metrics_feed(spark, tmp_path):
    from docext_spark.streaming.metrics_stream import run_metrics_feed
    from docext_spark.synth import transcripts_df
    in_dir = str(tmp_path / "in")
    df = transcripts_df(spark, n_convs=4, median_turns=4, hot_factor=2,
                        partitions=2)
    n = df.count()
    df.write.parquet(in_dir)
    out = run_metrics_feed(spark, in_dir, str(tmp_path / "out"),
                           str(tmp_path / "ckpt"))
    row = out.collect()[0]
    assert row["turns_processed"] == n
    assert row["classifier_decisions"] > 0

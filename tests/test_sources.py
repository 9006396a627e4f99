"""Bucketed transcripts layout roundtrip."""
from __future__ import annotations

import os

from docext_spark.sources.transcripts import (read_transcripts,
                                              with_conv_bucket,
                                              write_transcripts)
from docext_spark.synth import transcripts_df


def test_bucketed_roundtrip(spark, tmp_path):
    path = str(tmp_path / "transcripts")
    df = transcripts_df(spark, n_convs=6, median_turns=4, hot_factor=2,
                        partitions=4)
    write_transcripts(df, path, n_buckets=8)
    back = read_transcripts(spark, path)
    assert back.count() == df.count()
    assert set(back.columns) == {"conv_id", "turn_idx", "role", "text",
                                 "tool", "ts"}
    # a conversation's rows land in exactly one bucket directory
    buckets = [d for d in os.listdir(path) if d.startswith("conv_bucket=")]
    assert 1 <= len(buckets) <= 8
    one_conv = with_conv_bucket(df.filter("conv_id = 'conv_000001'"), 8)
    assert one_conv.select("conv_bucket").distinct().count() == 1

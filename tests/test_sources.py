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


def test_iceberg_ddl_strings():
    """The Iceberg DDL surface: generated FROM the engine StructTypes so
    schema drift is impossible; pinned here string-level (no Iceberg jars
    in this sandbox — on a real cluster spark.sql(ddl) is the one-flip
    deployment switch, see README)."""
    from docext_spark.sources.transcripts import (metrics_ddl, results_ddl,
                                                  transcripts_ddl)
    ddl = transcripts_ddl()
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS warehouse.db.transcripts (\n"
        "  conv_id STRING NOT NULL,\n"
        "  turn_idx INT NOT NULL,\n"
        "  role STRING,\n"
        "  text STRING,\n"
        "  tool STRING,\n"
        "  ts TIMESTAMP)\n"
        "USING iceberg\n"
        "PARTITIONED BY (bucket(256, conv_id))\n"
        "TBLPROPERTIES ('format-version' = '2', "
        "'write.distribution-mode' = 'hash')")
    r = results_ddl(n_buckets=64)
    assert "PARTITIONED BY (bucket(64, conv_id))" in r
    assert "md STRING" in r and "parse_ok BOOLEAN" in r
    m = metrics_ddl()
    assert "PARTITIONED BY" not in m
    assert "turns_processed BIGINT NOT NULL" in m
    assert m.startswith("CREATE TABLE IF NOT EXISTS "
                        "warehouse.db.extraction_metrics")

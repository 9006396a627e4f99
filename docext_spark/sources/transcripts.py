"""Transcripts table IO — cluster-ready layout.

Target layout (north rule): Iceberg table bucketed by conv_id with hidden
partitioning, e.g.

    CREATE TABLE warehouse.db.transcripts (
        conv_id STRING, turn_idx INT, role STRING,
        text STRING, tool STRING, ts TIMESTAMP)
    USING iceberg
    PARTITIONED BY (bucket(256, conv_id))
    TBLPROPERTIES ('write.distribution-mode' = 'hash')

This sandbox ships no Iceberg runtime jars, so the same physical layout is
realized as bucket-partitioned parquet (an explicit ``conv_bucket`` column =
``pmod(xxhash64(conv_id), n)``). The read/write helpers keep call sites
format-agnostic: on a real cluster, pass ``fmt="iceberg"`` and a table
identifier instead of a path.

Why bucket by conv_id: the reassembly groupBy(conv_id) then needs no
full shuffle (bucket-local aggregation), and conversation-level reads
prune to one bucket.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docext_spark.schema import TRANSCRIPT_SCHEMA

DEFAULT_BUCKETS = 256


def with_conv_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return df.withColumn("conv_bucket",
                         F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)))


def write_transcripts(df: DataFrame, path: str, fmt: str = "parquet",
                      n_buckets: int = DEFAULT_BUCKETS, mode: str = "overwrite"):
    if fmt == "iceberg":
        # hidden partitioning handles bucketing; no explicit column needed
        df.writeTo(path).using("iceberg").createOrReplace()
        return
    (with_conv_bucket(df, n_buckets)
     .repartition(n_buckets, "conv_bucket")  # one file per bucket, fanout off
     .write.mode(mode).partitionBy("conv_bucket").parquet(path))


def read_transcripts(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    from pyspark.sql import types as T
    # fresh StructType: StructType.add mutates in place, so adding to the
    # shared TRANSCRIPT_SCHEMA would poison every later consumer of it
    schema = T.StructType(list(TRANSCRIPT_SCHEMA.fields)
                          + [T.StructField("conv_bucket", T.IntegerType(), True)])
    return spark.read.schema(schema).parquet(path).drop("conv_bucket")

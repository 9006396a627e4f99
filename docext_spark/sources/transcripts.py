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
from pyspark.sql import types as T

from docext_spark.schema import LINEAGE_SCHEMA, TRANSCRIPT_SCHEMA

DEFAULT_BUCKETS = 256

# per-turn extraction results as committed by plans/pipeline.run_pipeline
RESULT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("md", T.StringType(), True),
    T.StructField("kind", T.StringType(), True),
    T.StructField("blocks_kept", T.IntegerType(), True),
    T.StructField("blocks_dropped", T.IntegerType(), True),
    T.StructField("classifier_decisions", T.IntegerType(), True),
    T.StructField("parse_ok", T.BooleanType(), True),
])


def create_table_ddl(table: str, schema: T.StructType,
                     partition_by: tuple[str, ...] = (),
                     fmt: str = "iceberg",
                     tblproperties: dict | None = None) -> str:
    """The real ``CREATE TABLE ... USING iceberg`` DDL, generated FROM the
    engine's StructTypes so the deployed table can never drift from what
    the pipeline reads/writes. This sandbox has no Iceberg runtime jars,
    so the DDL is emitted (for spark.sql on a real cluster) rather than
    executed here — the deployment switch is one config flip (README
    'Deploying against Iceberg'); everything else in the engine is
    format-agnostic through the fmt= seam."""
    cols = ",\n  ".join(
        f"{f.name} {f.dataType.simpleString().upper()}"
        f"{'' if f.nullable else ' NOT NULL'}"
        for f in schema.fields)
    ddl = f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols})\nUSING {fmt}"
    if partition_by:
        ddl += f"\nPARTITIONED BY ({', '.join(partition_by)})"
    if tblproperties:
        props = ", ".join(f"'{k}' = '{v}'"
                          for k, v in sorted(tblproperties.items()))
        ddl += f"\nTBLPROPERTIES ({props})"
    return ddl


def transcripts_ddl(table: str = "warehouse.db.transcripts",
                    n_buckets: int = DEFAULT_BUCKETS) -> str:
    """Input table: hidden bucket partitioning on conv_id, hash
    distribution so writers cluster rows by bucket without an explicit
    sort — the layout that makes reassembly's groupBy(conv_id)
    bucket-local at 10^12 turns."""
    return create_table_ddl(
        table, TRANSCRIPT_SCHEMA,
        partition_by=(f"bucket({n_buckets}, conv_id)",),
        tblproperties={"write.distribution-mode": "hash",
                       "format-version": "2"})


def results_ddl(table: str = "warehouse.db.extraction_results",
                n_buckets: int = DEFAULT_BUCKETS) -> str:
    """Per-turn results table: same conv_id bucketing as the input, so the
    resume anti-join (sources/checkpoint.py) is storage-partitioned on
    both sides and never shuffles the committed keys."""
    return create_table_ddl(
        table, RESULT_SCHEMA,
        partition_by=(f"bucket({n_buckets}, conv_id)",),
        tblproperties={"write.distribution-mode": "hash",
                       "format-version": "2"})


def metrics_ddl(table: str = "warehouse.db.extraction_metrics") -> str:
    """Per-partition lineage/metrics table (north rule: lineage + metrics
    published per run). Tiny (one row per task) — unpartitioned."""
    return create_table_ddl(table, LINEAGE_SCHEMA,
                            tblproperties={"format-version": "2"})


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

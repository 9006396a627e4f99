"""Streaming metrics feed (SURVEY.md §2.9 — optional surface).

The reference streams markdown incrementally to its UI (pdf2md.py:16-71,
97-137) but batch output ≡ streamed concatenation (pdf2md.py:169-181), so
the batch pipeline is the semantic source of truth. This module provides the
one genuinely streaming surface: an availableNow metrics feed that
incrementally folds new transcript parquet files into the lineage metrics
table with exactly-once checkpointing.
"""
from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docext_spark.operators.extract import turn_extract_udf
from docext_spark.schema import TRANSCRIPT_SCHEMA


def run_metrics_feed(spark: SparkSession, input_dir: str, output_dir: str,
                     checkpoint_dir: str):
    """Fold newly-arrived transcript files into per-file-batch metrics.

    availableNow trigger: processes everything present, then stops —
    re-running picks up only new files (streaming checkpoint = resume).
    """
    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .parquet(input_dir))
    extracted = stream.withColumn("ext", turn_extract_udf(F.col("text")))
    metrics = (extracted
               .select("conv_id",
                       F.size("ext.spans").alias("n_spans"),
                       F.col("ext.classifier_decisions").alias("decisions"),
                       (~F.col("ext.parse_ok")).cast("int").alias("fail")))
    agg = (metrics.groupBy()
           .agg(F.count(F.lit(1)).alias("turns_processed"),
                F.sum("n_spans").alias("spans_emitted"),
                F.sum("decisions").alias("classifier_decisions"),
                F.sum("fail").alias("parse_failures")))
    query = (agg.writeStream
             .outputMode("complete")
             .format("memory")
             .queryName("docext_metrics_feed")
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
    out = spark.sql("select * from docext_metrics_feed")
    # complete-mode emits CUMULATIVE totals — overwrite keeps the output a
    # current-snapshot table (appending would double-count prior files on
    # every rerun). When NO micro-batch ran (rerun with no new files) the
    # in-memory table is empty — overwriting then would WIPE the previously
    # accumulated snapshot, so keep the existing output instead.
    import os
    if query.lastProgress is None and os.path.isdir(output_dir):
        return spark.read.parquet(output_dir)
    out.write.mode("overwrite").parquet(output_dir)
    return out

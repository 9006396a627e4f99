"""Streaming exact deduplication — the ingest-side twin of
operators/dedup.exact_duplicates.

At 10^12-turn scale the training corpus arrives as a feed, and exact dups
should be dropped AT INGEST (before they cost storage and downstream
compute), not in a later batch pass. Pattern:

    fingerprint (sha256 of normalized text, the same expression the batch
    dedup groups on) → dropDuplicatesWithinWatermark

``dropDuplicatesWithinWatermark`` keeps the first arrival per fingerprint
and bounds the dedup state by event time: a fingerprint's state is dropped
once the watermark passes it, so state size tracks the dup-arrival horizon
(e.g. "dups arrive within 24h of each other"), not corpus size — the
property that makes streaming dedup feasible at 100TB. A plain
``dropDuplicates`` on a stream would grow state forever.

The reference has no streaming (batch ≡ stream per SURVEY §2.9); this is
part of the beyond-parity streaming surface alongside windowed.py and
stateful.py.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docext_spark.operators.textops import fingerprint


def dedup_stream(spark: SparkSession, input_dir: str, schema,
                 checkpoint_dir: str, output_dir: str,
                 text_col: str = "text", ts_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """availableNow stream → parquet of first-arrival rows per fingerprint.

    Resumable: rerunning with the same checkpoint processes only new input
    files, and fingerprints already emitted within the watermark horizon
    stay deduplicated across restarts (state lives in the checkpoint)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = (stream
               .withColumn("fp", fingerprint(F.col(text_col)))
               .withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark(["fp"]))
    q = (deduped.writeStream.outputMode("append").format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(output_dir)

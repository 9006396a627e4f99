"""Streaming benchmark decontamination — the ingest-side twin of
operators/decontam.decontaminate.

At feed scale, eval-set leakage should be dropped AT INGEST, like exact
dups (dedup_stream.py): a contaminated document that reaches storage
costs a full later batch sweep to find again. Decontamination is
per-document against a STATIC eval set — no cross-batch state — so
micro-batch application of the batch operator is semantically EXACT
(batch ≡ stream by construction, pinned in test_streaming_decontam).

The micro-batch transform contains an aggregation (shingle explode →
broadcast eval join → per-doc fold), which the native file sink cannot
express statelessly, so this stream uses ``foreachBatch`` with an
IDEMPOTENT batchId-keyed write: each micro-batch lands in its own
``batch=<id>`` partition directory with mode("overwrite"), so a replayed
batch (failure between sink write and checkpoint commit) overwrites its
own partition instead of appending duplicates — exactly-once at the
output level. A blind ``mode("append")`` foreachBatch would be
at-least-once; that is the failure mode this layout exists to close.

The per-batch plan is the batch operator's plan: eval n-grams broadcast,
corpus shingles map-side, one groupBy(doc) shuffle — per micro-batch.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from docext_spark.operators.decontam import decontaminate


def run_decontam_stream(spark: SparkSession, input_dir: str, schema,
                        checkpoint_dir: str, output_dir: str,
                        eval_df: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        eval_id_col: str = "eval_id",
                        eval_text_col: str = "text",
                        n: int = 8, min_hits: int = 1) -> DataFrame:
    """availableNow stream → parquet of decontaminated rows, partitioned
    by micro-batch id (idempotent on replay). Resumable: rerunning with
    the same checkpoint processes only new input files."""
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        kept = decontaminate(batch, eval_df, id_col, text_col,
                             eval_id_col, eval_text_col,
                             n=n, min_hits=min_hits)
        (kept.write.mode("overwrite")
             .parquet(f"{output_dir}/batch={batch_id}"))

    q = (stream.writeStream.foreachBatch(_sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.option("basePath", output_dir).parquet(output_dir)

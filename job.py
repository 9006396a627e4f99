"""Cluster entrypoint — the job you spark-submit (north rule packaging):

    python tools/make_pyfiles_zip.py               # build docext_spark.zip
    spark-submit --master <cluster> --py-files docext_spark.zip job.py \
        --input  <transcripts path or iceberg table> \
        --output <results root> \
        --metrics <metrics table path> \
        [--format parquet|iceberg] [--synth-convs N]

Runs the flagship extraction pipeline with checkpoint/resume: rerunning
after a failure processes only uncommitted (conv_id, turn_idx) keys.

``--mode curate`` instead runs the corpus-curation plan (quality gate →
exact dedup → LSH fuzzy dedup → clustering → keep-one) over a documents
table (doc_id, text) and writes the curated corpus + survivorship funnel.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts path / iceberg table")
    ap.add_argument("--output", required=True, help="checkpointed results root")
    ap.add_argument("--metrics", help="lineage metrics table path")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg"])
    ap.add_argument("--synth-convs", type=int, default=0,
                    help="generate a seeded synthetic input instead of --input")
    ap.add_argument("--conv-output", help="optional conversation-level output")
    ap.add_argument("--chunked", action="store_true",
                    help="bounded-row conversation output (multi-GB convs)")
    ap.add_argument("--mode", default="extract",
                    choices=["extract", "curate"],
                    help="extract = flagship transcript pipeline; "
                         "curate = corpus curation over a documents table")
    ap.add_argument("--redact", action="store_true",
                    help="curate mode: PII-scrub the output corpus text "
                         "(dedup still keys on the original bytes)")
    ap.add_argument("--repetition-gate", action="store_true",
                    help="curate mode: add Gopher repetition gates to the "
                         "quality stage (dup-line frac 0.3, top-token frac 0.2)")
    ap.add_argument("--token-budget", type=int, default=0,
                    help="curate mode: content-addressed sample of the "
                         "curated corpus down to ~N tokens (0 = keep all)")
    ap.add_argument("--stage-path",
                    help="curate mode: write each pipeline stage to parquet "
                         "under this dir instead of caching in executor "
                         "memory+disk — the 100TB shape (stages double as "
                         "restart points)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("docext_spark_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.mode == "curate":
        from docext_spark.plans.curate import curate
        if not args.input:
            ap.error("--mode curate requires --input (a documents table)")
        docs = spark.read.parquet(args.input)
        t0 = time.time()
        gates = {}
        if args.repetition_gate:
            gates = {"max_dup_line_frac": 0.3, "max_tok_frac": 0.2}
        res = curate(docs, redact=args.redact,
                     stage_path=args.stage_path, **gates)
        corpus = res["corpus"]
        if args.token_budget:
            from docext_spark.operators.sampling import sample_to_token_budget
            corpus = sample_to_token_budget(corpus, args.token_budget)
        corpus.write.mode("overwrite").parquet(args.output)
        # evaluate the funnel ONCE (4 rows); re-materialize for the
        # metrics sink from the collected rows, not the pipeline
        funnel_rows = res["funnel"].collect()
        funnel = {r["stage"]: r["n_docs"] for r in funnel_rows}
        if args.metrics:
            spark.createDataFrame(funnel_rows) \
                .write.mode("overwrite").parquet(args.metrics)
        res["unpersist"]()
        print(json.dumps({"funnel": funnel,
                          "sec": round(time.time() - t0, 2)}))
        spark.stop()
        return

    from docext_spark.plans.pipeline import run_pipeline
    from docext_spark.sources.transcripts import read_transcripts

    if args.synth_convs:
        from docext_spark.synth import transcripts_df
        transcripts = transcripts_df(spark, n_convs=args.synth_convs)
    elif args.input:
        transcripts = read_transcripts(spark, args.input, fmt=args.format)
    else:
        ap.error("one of --input / --synth-convs is required")

    t0 = time.time()
    res = run_pipeline(spark, transcripts, output_root=args.output,
                       metrics_path=args.metrics)
    convs = res["convs"]
    if args.chunked:
        from docext_spark.operators.reassemble import (
            reassemble_conversations_chunked)
        convs = reassemble_conversations_chunked(res["turns"])
    if args.conv_output:
        convs.write.mode("overwrite").parquet(args.conv_output)
    else:
        convs.write.mode("overwrite").format("noop").save()
    elapsed = time.time() - t0

    n = res["turns"].count()
    print(json.dumps({"turns_total": n, "turns_written": res["written"],
                      "sec": round(elapsed, 2),
                      "turns_per_sec": round(res["written"] / elapsed, 1)
                      if res["written"] else 0.0}))
    spark.stop()


if __name__ == "__main__":
    main()

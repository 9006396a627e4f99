"""Streaming decontamination: batch ≡ stream equality, cross-batch
consistency against the static eval set, idempotent resume."""
from __future__ import annotations

from docext_spark.operators.decontam import decontaminate
from docext_spark.streaming.decontam_stream import run_decontam_stream

SCHEMA = "doc_id long, text string"
EVAL = "the quick brown fox jumps over the lazy dog tonight"


def _eval_df(spark):
    return spark.createDataFrame([(100, EVAL)], "eval_id long, text string")


def test_stream_decontam_batch_equivalence_and_resume(spark, tmp_path):
    in_dir, ckpt, out_dir = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    ev = _eval_df(spark)

    b1 = [(0, "prefix words here " + EVAL + " and trailing filler"),
          (1, "totally clean document about other things entirely "
              "with plenty of tokens")]
    spark.createDataFrame(b1, SCHEMA).coalesce(1) \
         .write.mode("append").parquet(in_dir)
    out1 = run_decontam_stream(spark, in_dir, SCHEMA, ckpt, out_dir, ev)
    assert sorted(r["doc_id"] for r in out1.collect()) == [1]

    # batch 2, same checkpoint: only new files processed; a contaminated
    # doc arriving later is still dropped against the same static eval set
    b2 = [(2, "the quick brown fox jumps over the lazy dog tonight "
              "verbatim leak with extra words"),
          (3, "another clean one that mentions a quick brown fox only "
              "briefly and out of order")]
    spark.createDataFrame(b2, SCHEMA).coalesce(1) \
         .write.mode("append").parquet(in_dir)
    out2 = run_decontam_stream(spark, in_dir, SCHEMA, ckpt, out_dir, ev)
    stream_ids = sorted(r["doc_id"] for r in out2.collect())
    assert stream_ids == [1, 3]

    # batch ≡ stream: the batch operator over the full input produces the
    # same kept set (decontamination is per-document, no cross-batch state)
    batch_ids = sorted(r["doc_id"] for r in
                       decontaminate(spark.read.parquet(in_dir), ev)
                       .collect())
    assert batch_ids == stream_ids

    # idempotent resume: rerun with nothing new — no duplicate outputs
    out3 = run_decontam_stream(spark, in_dir, SCHEMA, ckpt, out_dir, ev)
    assert sorted(r["doc_id"] for r in out3.collect()) == [1, 3]

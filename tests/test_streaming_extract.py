"""Flagship extraction as a Structured Stream: batch ≡ stream per-turn
byte equality, exactly-once across a mid-stream kill + resume, and
incremental processing of late-arriving files."""
from __future__ import annotations

from pyspark.sql import functions as F

from docext_spark.streaming.extract_stream import (kill_after_first_commit,
                                                   run_extraction_stream,
                                                   start_extraction_stream)
from docext_spark.synth import transcripts_df


def _write_input(spark, path, n_convs=20, n_files=6, seed=42):
    tdf = transcripts_df(spark, n_convs=n_convs, median_turns=6,
                         hot_factor=10, seed=seed, partitions=n_files)
    tdf.write.mode("append").parquet(path)
    return tdf


def _no_dups_and_complete(out, tdf):
    n_in = tdf.count()
    assert out.count() == n_in
    assert out.select("conv_id", "turn_idx").distinct().count() == n_in


def test_stream_matches_batch_byte_for_byte(spark, tmp_path):
    from docext_spark.plans.pipeline import run_extraction
    in_dir, ckpt, out_dir = (str(tmp_path / d) for d in ("in", "ck", "out"))
    tdf = _write_input(spark, in_dir)
    out = run_extraction_stream(spark, in_dir, ckpt, out_dir)
    _no_dups_and_complete(out, tdf)
    batch = run_extraction(spark.read.parquet(in_dir)) \
        .select("conv_id", "turn_idx", "md")
    # anti-join both ways: zero asymmetric rows == per-turn byte equality
    assert out.select("conv_id", "turn_idx", "md") \
        .join(batch, ["conv_id", "turn_idx", "md"], "left_anti").count() == 0
    assert batch.join(out.select("conv_id", "turn_idx", "md"),
                      ["conv_id", "turn_idx", "md"], "left_anti").count() == 0


def test_stream_kill_and_resume_no_duplicates(spark, tmp_path):
    """Kill the query after the first microbatch commit (maxFilesPerTrigger
    forces several batches), restart on the same checkpoint, and verify
    the final output is complete with zero duplicate turns — the
    exactly-once property the checkpoint + file-sink transaction log is
    there to provide."""
    in_dir, ckpt, out_dir = (str(tmp_path / d) for d in ("in", "ck", "out"))
    tdf = _write_input(spark, in_dir)
    q = start_extraction_stream(spark, in_dir, ckpt, out_dir,
                                max_files_per_trigger=1)
    kill_after_first_commit(q)
    # partial output: committed batches only, readable through the metadata
    # log, no duplicates even mid-stream
    partial = spark.read.parquet(out_dir)
    n_partial = partial.count()
    assert partial.select("conv_id", "turn_idx").distinct().count() \
        == n_partial
    # resume: same checkpoint drains the rest
    out = run_extraction_stream(spark, in_dir, ckpt, out_dir,
                                max_files_per_trigger=2)
    _no_dups_and_complete(out, tdf)


def test_stream_incremental_new_files_only(spark, tmp_path):
    """After a full drain, only files that arrived later are processed on
    the next run (the streaming twin of the batch anti-join resume)."""
    in_dir, ckpt, out_dir = (str(tmp_path / d) for d in ("in", "ck", "out"))
    t1 = _write_input(spark, in_dir, n_convs=10, seed=1)
    out1 = run_extraction_stream(spark, in_dir, ckpt, out_dir)
    n1 = t1.count()
    assert out1.count() == n1
    # second wave of conversations lands
    t2 = transcripts_df(spark, n_convs=8, median_turns=5, hot_factor=5,
                        seed=2, partitions=3) \
        .withColumn("conv_id", F.concat(F.lit("wave2-"), F.col("conv_id")))
    t2.write.mode("append").parquet(in_dir)
    out2 = run_extraction_stream(spark, in_dir, ckpt, out_dir)
    assert out2.count() == n1 + t2.count()
    assert out2.select("conv_id", "turn_idx").distinct().count() \
        == n1 + t2.count()

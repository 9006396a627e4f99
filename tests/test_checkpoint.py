"""S6/J4 — checkpoint/resume: interrupted run resumes without duplicate
work and converges to the identical final table (SURVEY.md §5.2 item 5)."""
from __future__ import annotations

from pyspark.sql import functions as F

from docext_spark.plans.pipeline import run_pipeline
from docext_spark.sources.checkpoint import CheckpointedResults
from docext_spark.synth import transcripts_df


def test_resume_no_duplicates(spark, tmp_path):
    root = str(tmp_path / "results")
    df = transcripts_df(spark, n_convs=8, median_turns=5, hot_factor=3,
                        partitions=4)
    total = df.count()

    # simulate a partial run that dies after committing half the convs
    first_half = df.filter(F.col("conv_id") < "conv_000004")
    ckpt = CheckpointedResults(root)
    run_pipeline(spark, first_half, output_root=root)
    n_committed = ckpt.committed(spark).count()
    assert 0 < n_committed < total

    # resume over the FULL input: only remaining keys are processed
    todo = ckpt.remaining(spark, df)
    assert todo.count() == total - n_committed

    res = run_pipeline(spark, df, output_root=root)
    assert res["written"] == total - n_committed  # no duplicate work
    final = ckpt.committed(spark)
    assert final.count() == total
    assert final.select("conv_id", "turn_idx").distinct().count() == total

    # idempotent: a third run writes nothing
    res3 = run_pipeline(spark, df, output_root=root)
    assert res3["written"] == 0


def test_resume_key_is_content_addressed(spark):
    from docext_spark.sources.checkpoint import resume_key
    df = spark.createDataFrame(
        [("c1", 0, "hello"), ("c1", 0, "hello"), ("c1", 0, "changed")],
        "conv_id string, turn_idx int, text string")
    keys = [r[0] for r in df.select(resume_key()).collect()]
    assert keys[0] == keys[1] != keys[2]


def test_uncommitted_batch_is_invisible(spark, tmp_path):
    """Snapshot atomicity: a batch directory whose manifest entry was never
    appended (crash between write and commit) must be invisible —
    committed() skips it and remaining() still returns its rows."""
    import os
    from docext_spark.sources.checkpoint import CheckpointedResults
    root = str(tmp_path / "results")
    ckpt = CheckpointedResults(root)
    src = spark.createDataFrame(
        [("c1", 0, "a"), ("c1", 1, "b")], "conv_id string, turn_idx int, md string")
    # simulate the crash: files written, manifest NOT updated
    os.makedirs(root, exist_ok=True)
    src.write.parquet(os.path.join(root, "batch-orphaned"))
    assert ckpt.committed(spark) is None          # no manifest → nothing committed
    assert ckpt.remaining(spark, src).count() == 2  # all rows still to do
    # a real commit then excludes exactly the committed keys
    ckpt.commit(src.limit(1))
    assert ckpt.remaining(spark, src).count() == 1

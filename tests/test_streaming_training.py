"""Streaming training-sample emission: closed samples equal the batch
plan's rows for the same events, and the open-chunk state survives a
second availableNow run (resume continues mid-session)."""
from __future__ import annotations

import datetime as dt
import os

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from docext_spark.plans.training import sessions_to_training_samples
from docext_spark.streaming.training_stream import run_training_stream

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame([(i, T0 + dt.timedelta(minutes=m), u, t)
                      for i, (u, m, t) in enumerate(rows)],
                     columns=["event_id", "ts", "user_id", "text"]),
        SCHEMA)


ROWS_A = [
    (1, 0, "a b c"), (1, 1, "d e f"), (1, 2, "g h"),      # session 1
    (1, 60, "i j k l"),                                    # session 2
    (2, 5, "m n"),
]
ROWS_B = [
    (1, 61, "o p"),            # continues user 1 session 2
    (1, 200, "q"),             # new session 3 -> closes session 2's chunk
    (2, 300, "r s t"),         # new session for user 2
]


def _closed(rows):
    return {(r["sample_id"]): (r["n_events"], r["n_tokens"],
                               r["sample_text"]) for r in rows}


def test_stream_matches_batch_closed_samples(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    _df(spark, ROWS_A).coalesce(1).write.mode("append").parquet(in_dir)
    got = _closed(run_training_stream(spark, in_dir, SCHEMA, ck, out,
                                      budget_tokens=4).collect())
    # batch twin over the same events: budget 4, gap 30
    batch = {r["sample_id"]: (r["n_events"], r["n_tokens"], r["sample_text"])
             for r in sessions_to_training_samples(
                 _df(spark, ROWS_A), "user_id", "ts", "text", 30, 4,
                 "event_id").collect()}
    # session 1 of user 1: 3+3=6 toks -> chunk 0 closes when "g h" starts
    # chunk 1; then the minute-60 gap event closes chunk 1 too (new
    # session). Session 2's chunk and user 2's chunk stay OPEN.
    assert got == {"1#1/0": batch["1#1/0"], "1#1/1": batch["1#1/1"]}
    assert batch["1#1/0"] == (2, 6, "a b c\nd e f")
    assert batch["1#1/1"] == (1, 2, "g h")


def test_stream_resume_continues_open_chunks(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    _df(spark, ROWS_A).coalesce(1).write.mode("append").parquet(in_dir)
    run_training_stream(spark, in_dir, SCHEMA, ck, out, budget_tokens=4)
    # second run: more files land; state resumes mid-session
    _df(spark, ROWS_B).coalesce(1).write.mode("append").parquet(in_dir)
    got = _closed(run_training_stream(spark, in_dir, SCHEMA, ck, out,
                                      budget_tokens=4).collect())
    # all events in one batch plan = ground truth for every CLOSED sample
    batch = {r["sample_id"]: (r["n_events"], r["n_tokens"], r["sample_text"])
             for r in sessions_to_training_samples(
                 _df(spark, ROWS_A + ROWS_B), "user_id", "ts", "text",
                 30, 4, "event_id").collect()}
    # closed by now: 1#1/0 + 1#1/1 (run 1); 1#2/0 ("i j k l", closed when
    # "o p" crossed the budget boundary), 1#2/1 ("o p", closed by the
    # minute-200 gap), 2#1/0 (closed by user 2's 300-min event)
    assert set(got) == {"1#1/0", "1#1/1", "1#2/0", "1#2/1", "2#1/0"}
    for sid, v in got.items():
        assert v == batch[sid], sid
    # open tails (1#3/0 and 2#2/0) are not emitted yet
    assert "1#3/0" not in got and "2#2/0" not in got


def test_multi_arrow_chunk_group_stays_ordered(spark, tmp_path):
    """Code-review r5: a group spanning several Arrow record batches must
    be sorted as ONE batch — per-chunk sorting scrambled session folds
    (reproduced at maxRecordsPerBatch=2 with descending-ts input)."""
    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    rows = [(1, 5 - i, f"w{5 - i}") for i in range(6)]   # descending ts
    _df(spark, rows).coalesce(1).write.mode("append").parquet(in_dir)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        got = _closed(run_training_stream(spark, in_dir, SCHEMA, ck, out,
                                          budget_tokens=4).collect())
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    # 6 one-token events, budget 4: chunk 0 = w0..w3 closes when w4 starts
    # chunk 1; w4/w5 stay open
    assert got == {"1#1/0": (4, 4, "w0\nw1\nw2\nw3")}


def test_cross_batch_disorder_is_flagged_not_silent(spark, tmp_path):
    """VERDICT r5 #8: the docstring's ordering caveat is enforced. An event
    arriving in a LATER micro-batch with an EARLIER timestamp than the
    entity's last folded event must (a) fold deterministically in arrival
    order — joining the open chunk, never retro-opening a closed sample —
    and (b) be counted in the emitted sample's n_disorder lineage column,
    while well-ordered samples stay at 0."""
    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    # batch 1: two ordered events, chunk 0 stays OPEN (6 toks, budget 4
    # boundary only takes effect when the NEXT event starts)
    _df(spark, [(1, 0, "a b c"), (1, 1, "d e f")]) \
        .coalesce(1).write.mode("append").parquet(in_dir)
    first = run_training_stream(spark, in_dir, SCHEMA, ck, out,
                                budget_tokens=4).collect()
    assert first == []                      # nothing closed yet
    # batch 2: minute-0.5 event arrives AFTER minute-1 was folded
    # (cross-batch disorder) → folds into the new chunk 1; the minute-40
    # gap event then closes that chunk, surfacing the flag
    _df(spark, [(1, 0.5, "x y"), (1, 40, "w")]) \
        .coalesce(1).write.mode("append").parquet(in_dir)
    rows = run_training_stream(spark, in_dir, SCHEMA, ck, out,
                               budget_tokens=4).collect()
    got = {r["sample_id"]: (r["n_events"], r["n_tokens"], r["sample_text"],
                            r["n_disorder"]) for r in rows}
    assert got == {
        "1#1/0": (2, 6, "a b c\nd e f", 0),   # ordered: flag stays 0
        "1#1/1": (1, 2, "x y", 1),            # the disorder arrival
    }


def test_cold_start_empty_input_returns_empty(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    out = run_training_stream(spark, in_dir, SCHEMA,
                              str(tmp_path / "ck"), str(tmp_path / "out"))
    assert out.count() == 0

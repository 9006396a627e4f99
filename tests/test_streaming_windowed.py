"""Watermarked event-time windows: late data handling + batch equivalence."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from docext_spark.schema import TRANSCRIPT_SCHEMA
from docext_spark.streaming.windowed import windowed_counts, windowed_counts_stream


def _rows(base, spec):
    # spec: (minute_offset, role)
    return [("c1", i, role, "x", "",
             base + dt.timedelta(minutes=m)) for i, (m, role) in enumerate(spec)]


def test_batch_windowed_counts(spark):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        _rows(base, [(0, "user"), (30, "user"), (61, "assistant"),
                     (62, "user"), (125, "tool")]),
        TRANSCRIPT_SCHEMA)
    out = {(r["window_start"], r["role"]): r["n"]
           for r in windowed_counts(df).collect()}
    assert out[("2026-01-01 00:00:00", "user")] == 2
    assert out[("2026-01-01 01:00:00", "user")] == 1
    assert out[("2026-01-01 01:00:00", "assistant")] == 1
    assert out[("2026-01-01 02:00:00", "tool")] == 1


def test_stream_watermark_closes_windows_and_drops_late(spark, tmp_path):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    # file 1: hours 0 and 3 → watermark reaches 3:00-0:30 = 2:30,
    # closing windows 0 and 1
    f1 = spark.createDataFrame(
        _rows(base, [(0, "user"), (20, "user"), (180, "assistant")]),
        TRANSCRIPT_SCHEMA)
    f1.coalesce(1).write.mode("append").parquet(in_dir)
    out_dir = str(tmp_path / "out")
    out1 = windowed_counts_stream(spark, in_dir, TRANSCRIPT_SCHEMA, ckpt, out_dir)
    emitted1 = {(r["window_start"], r["role"]): r["n"] for r in out1.collect()}
    assert emitted1.get(("2026-01-01 00:00:00", "user")) == 2
    # the 3:00 window is still open — must NOT be emitted yet
    assert ("2026-01-01 03:00:00", "assistant") not in emitted1

    # file 2: a late row for hour 0 (far behind watermark → dropped) and a
    # fresh row at hour 6 that closes the 3:00 window
    f2 = spark.createDataFrame(
        _rows(base, [(5, "user"), (360, "tool")]), TRANSCRIPT_SCHEMA)
    f2.coalesce(1).write.mode("append").parquet(in_dir)
    out2 = windowed_counts_stream(spark, in_dir, TRANSCRIPT_SCHEMA, ckpt, out_dir)
    emitted2 = {(r["window_start"], r["role"]): r["n"] for r in out2.collect()}
    assert emitted2.get(("2026-01-01 03:00:00", "assistant")) == 1
    # late hour-0 row was beyond the watermark: the closed window's count
    # must not have been re-emitted or grown
    zero_rows = [v for (w, _r), v in emitted2.items()
                 if w == "2026-01-01 00:00:00"]
    assert zero_rows in ([], [2])

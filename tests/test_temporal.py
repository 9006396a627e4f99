"""As-of and range joins (operators/temporal.py): semantics edges and
the no-non-equi-join plan guarantee."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from docext_spark.operators.temporal import asof_join, range_join

BASE = dt.datetime(2026, 1, 1)


def _t(m):
    return BASE + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "l-a"), (1, _t(20), "l-b"), (1, _t(9), "l-early"),
         (2, _t(5), "l-c")],
        "k long, ts timestamp, pid string")
    right = spark.createDataFrame(
        [(1, _t(10), 1.0), (1, _t(15), 2.0), (2, _t(99), 3.0)],
        "k long, ts timestamp, v double")
    return left, right


def test_asof_backward_inclusive_and_no_match(sides):
    left, right = sides
    out = {r["pid"]: r for r in asof_join(left, right, ["k"]).collect()}
    assert len(out) == 4                       # every left row survives
    # exact-ts tie matches (inclusive); later click sees the newer state
    assert out["l-a"]["ts_matched"] == _t(10) and out["l-a"]["v_matched"] == 1.0
    assert out["l-b"]["ts_matched"] == _t(15) and out["l-b"]["v_matched"] == 2.0
    # before any right row / right row only in the future → NULLs
    assert out["l-early"]["ts_matched"] is None
    assert out["l-c"]["ts_matched"] is None


def test_asof_tolerance_voids_stale_matches(sides):
    left, right = sides
    out = {r["pid"]: r for r in
           asof_join(left, right, ["k"],
                     tolerance_us=4 * 60_000_000).collect()}
    assert out["l-a"]["ts_matched"] == _t(10)      # staleness 0 ok
    assert out["l-b"]["ts_matched"] is None        # 5 min > 4 min bound
    assert len(out) == 4                           # rows still all kept


def test_asof_forward_direction(sides):
    left, right = sides
    out = {r["pid"]: r for r in
           asof_join(left, right, ["k"], direction="forward").collect()}
    # smallest right ts >= left ts; ties inclusive
    assert out["l-a"]["ts_matched"] == _t(10) and out["l-a"]["v_matched"] == 1.0
    assert out["l-early"]["ts_matched"] == _t(10)   # next future state
    assert out["l-b"]["ts_matched"] is None         # nothing after :20
    assert out["l-c"]["ts_matched"] == _t(99)


def test_asof_forward_tolerance(sides):
    left, right = sides
    out = {r["pid"]: r for r in
           asof_join(left, right, ["k"], direction="forward",
                     tolerance_us=2 * 60_000_000).collect()}
    assert out["l-a"]["ts_matched"] == _t(10)       # gap 0 within bound
    assert out["l-early"]["ts_matched"] == _t(10)   # 1 min <= 2 min
    assert out["l-c"]["ts_matched"] is None         # 94 min away — voided


def test_asof_bad_direction(sides):
    left, right = sides
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, ["k"], direction="nearest")


def test_asof_empty_right(spark, sides):
    left, _ = sides
    right = spark.createDataFrame([], "k long, ts timestamp, v double")
    out = asof_join(left, right, ["k"]).collect()
    assert len(out) == 4
    assert all(r["ts_matched"] is None for r in out)


def test_asof_one_shuffle_no_join(sides):
    left, right = sides
    plan = (asof_join(left, right, ["k"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan                      # union+window, no join
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_containment_edges(spark):
    pts = spark.createDataFrame(
        [(1, _t(8), "at-start"), (1, _t(12), "at-end"),
         (1, _t(10), "inside"), (1, _t(50), "outside"),
         (2, _t(10), "other-key")],
        "k long, ts timestamp, pid string")
    iv = spark.createDataFrame(
        [(1, _t(8), _t(12), "w1"),
         (1, _t(0), _t(60), "wide"),        # spans many bins
         (1, _t(30), _t(30), "empty"),      # start == end → no rows
         (2, _t(11), _t(12), "w2")],
        "k long, start timestamp, end timestamp, iid string")
    got = {(r["pid"], r["iid"]) for r in
           range_join(pts, iv, ["k"], bin_width_us=5 * 60_000_000)
           .collect()}
    assert got == {("at-start", "w1"),             # start inclusive
                   ("inside", "w1"),
                   ("at-start", "wide"), ("at-end", "wide"),
                   ("inside", "wide"), ("outside", "wide")}
    # end exclusive: ("at-end","w1") absent; empty interval matches nothing


def test_range_join_bin_guard(spark):
    pts = spark.createDataFrame([(1, _t(1), "p")],
                                "k long, ts timestamp, pid string")
    iv = spark.createDataFrame([(1, _t(0), _t(1000), "big")],
                               "k long, start timestamp, end timestamp, iid string")
    with pytest.raises(Exception, match="max_bins_per_interval"):
        range_join(pts, iv, ["k"], bin_width_us=60_000_000,
                   max_bins_per_interval=10).collect()


def test_range_join_no_nested_loop(spark):
    pts = spark.createDataFrame([(1, _t(1), "p")],
                                "k long, ts timestamp, pid string")
    iv = spark.createDataFrame([(1, _t(0), _t(10), "w")],
                               "k long, start timestamp, end timestamp, iid string")
    plan = (range_join(pts, iv, ["k"], bin_width_us=600_000_000)
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_tz_timestamp_type(spark):
    # the micros/timestampdiff paths must accept plain TIMESTAMP too
    left = spark.createDataFrame([(1, _t(10), "x")],
                                 "k long, ts timestamp, pid string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame([(1, _t(5), 7.0)],
                                  "k long, ts timestamp, v double")
    out = asof_join(left, right, ["k"],
                    tolerance_us=10 * 60_000_000).collect()
    assert out[0]["v_matched"] == 7.0


def test_range_join_ntz(spark):
    pts = spark.createDataFrame([(1, _t(10), "p")],
                                "k long, ts timestamp_ntz, pid string")
    iv = spark.createDataFrame(
        [(1, _t(8), _t(12), "w")],
        "k long, start timestamp_ntz, end timestamp_ntz, iid string")
    assert range_join(pts, iv, ["k"], bin_width_us=600_000_000) \
        .count() == 1

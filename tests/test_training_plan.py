"""Conversation → training-example emission: hand-computed chunk
boundaries, oversized events, ordered text, and the funnel rollup."""
from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from docext_spark.plans.training import (sessions_to_training_samples,
                                         training_funnel)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (user, minute_offset, text)."""
    return spark.createDataFrame(
        pd.DataFrame([(i, T0 + dt.timedelta(minutes=m), u, t)
                      for i, (u, m, t) in enumerate(rows)],
                     columns=["event_id", "ts", "user_id", "text"]),
        "event_id long, ts timestamp, user_id long, text string")


def test_chunk_boundaries_hand_computed(spark):
    # user 1, one session: events of 3/3/3/3 tokens with budget 5:
    # cum_before = 0,3,6,9 -> chunks 0,0,1,1
    ev = _events(spark, [(1, 0, "a b c"), (1, 1, "d e f"),
                         (1, 2, "g h i"), (1, 3, "j k l")])
    out = {r["sample_id"]: r for r in sessions_to_training_samples(
        ev, "user_id", "ts", "text", 30, 5, "event_id").collect()}
    assert set(out) == {"1#1/0", "1#1/1"}
    assert out["1#1/0"]["n_events"] == 2 and out["1#1/0"]["n_tokens"] == 6
    assert out["1#1/0"]["sample_text"] == "a b c\nd e f"
    assert out["1#1/1"]["sample_text"] == "g h i\nj k l"


def test_session_gap_resets_chunking(spark):
    # a >30-min gap starts session 2, whose chunk index restarts at 0
    ev = _events(spark, [(1, 0, "a b c d"), (1, 1, "e f"),
                         (1, 60, "g h")])
    out = {r["sample_id"]: r["n_tokens"]
           for r in sessions_to_training_samples(
               ev, "user_id", "ts", "text", 30, 4, "event_id").collect()}
    assert out == {"1#1/0": 4, "1#1/1": 2, "1#2/0": 2}


def test_oversized_event_single_chunk(spark):
    # an event larger than the budget lands in exactly one chunk and the
    # next event starts a fresh one
    ev = _events(spark, [(1, 0, "t1 t2 t3 t4 t5 t6 t7 t8"), (1, 1, "x")])
    out = {r["sample_id"]: (r["n_events"], r["n_tokens"])
           for r in sessions_to_training_samples(
               ev, "user_id", "ts", "text", 30, 3, "event_id").collect()}
    assert out == {"1#1/0": (1, 8), "1#1/2": (1, 1)}


def test_rejects_nonpositive_budget(spark):
    ev = _events(spark, [(1, 0, "a")])
    with pytest.raises(ValueError, match="budget_tokens"):
        sessions_to_training_samples(ev, budget_tokens=0)


def test_funnel_counts(spark):
    ev = _events(spark, [(1, 0, "a b c"), (1, 1, "d e f"), (1, 60, "g"),
                         (2, 0, "h i")])
    row = training_funnel(ev, "user_id", "ts", "text", 30, 4,
                          "event_id").collect()[0]
    assert row["n_events"] == 4
    assert row["n_entities"] == 2
    assert row["n_sessions"] == 3        # 1#1, 1#2, 2#1
    # 1#1 does NOT split: the second event's cum_before is 3 < 4, so it
    # joins chunk 0 (budget-boundary packing overshoots, never pre-splits)
    assert row["n_samples"] == 3
    assert row["total_tokens"] == 9
    assert row["max_sample_tokens"] == 6

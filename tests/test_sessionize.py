"""Gap-based sessionization: hand-computable boundaries, tiebreak
determinism, rollup stats, and the conversation-splitting use case."""
from __future__ import annotations

import datetime as dt

import pandas as pd

from docext_spark.operators.sessionize import session_stats, sessionize

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame([(i, T0 + dt.timedelta(minutes=m), u, v)
                      for i, (u, m, v) in enumerate(rows)],
                     columns=["event_id", "ts", "user_id", "value"]),
        "event_id long, ts timestamp, user_id long, value double")


def test_session_boundaries_hand_computed(spark):
    # user 1: events at 0, 10, 50, 55 min (30-min gap) -> sessions 1,1,2,2
    # user 2: events at 5, 200 min -> sessions 1, 2
    ev = _events(spark, [(1, 0, 1.0), (1, 10, 2.0), (1, 50, 3.0),
                         (1, 55, 4.0), (2, 5, 5.0), (2, 200, 6.0)])
    got = {(r["user_id"], r["event_id"]): (r["session_idx"],
                                           r["is_session_start"])
           for r in sessionize(ev, "user_id", "ts", 30,
                               tiebreak_col="event_id").collect()}
    assert got[(1, 0)] == (1, True)
    assert got[(1, 1)] == (1, False)
    assert got[(1, 2)] == (2, True)      # 40-min gap > 30
    assert got[(1, 3)] == (2, False)
    assert got[(2, 4)] == (1, True)
    assert got[(2, 5)] == (2, True)


def test_exact_gap_is_same_session(spark):
    """The boundary is strict (> gap), at exact microsecond precision."""
    ev = _events(spark, [(1, 0, 0.0), (1, 30, 0.0)])  # exactly 30 min
    out = sessionize(ev, "user_id", "ts", 30, "event_id").collect()
    assert {r["session_idx"] for r in out} == {1}


def test_session_stats_rollup(spark):
    ev = _events(spark, [(1, 0, 1.0), (1, 10, 2.0), (1, 50, 3.0),
                         (2, 5, 5.0)])
    got = {r["session_id"]: r for r in
           session_stats(ev, "user_id", "ts", 30, "event_id",
                         value_col="value").collect()}
    s11 = got["1#1"]
    assert s11["n_events"] == 2 and s11["duration_s"] == 600
    assert s11["sum_value"] == 3.0
    assert got["1#2"]["n_events"] == 1 and got["1#2"]["duration_s"] == 0
    assert got["2#1"]["n_events"] == 1


def test_sessionize_conversations(spark):
    """The transcript use case: a conv with a multi-hour silence splits
    into training-window sessions; session_id is content-addressed, so a
    rerun/repartition yields identical ids."""
    from docext_spark.synth import transcripts_df
    t = transcripts_df(spark, n_convs=6, median_turns=5, seed=3,
                       partitions=4)
    s1 = sessionize(t, "conv_id", "ts", gap_minutes=120,
                    tiebreak_col="turn_idx")
    s2 = sessionize(t.repartition(13), "conv_id", "ts", gap_minutes=120,
                    tiebreak_col="turn_idx")
    a = {(r["conv_id"], r["turn_idx"]): r["session_id"] for r in s1.collect()}
    b = {(r["conv_id"], r["turn_idx"]): r["session_id"] for r in s2.collect()}
    assert a == b
    assert all(sid.startswith(str(k[0])) for k, sid in a.items())


def test_sessionize_preserves_existing_prev_ts_column(spark):
    """An input column named `_prev_ts` survives untouched (ADVICE r4:
    fixed temp name silently overwrote then dropped it)."""
    import pandas as pd
    ev = spark.createDataFrame(
        pd.DataFrame([(0, T0, 1, 7.0), (1, T0 + dt.timedelta(minutes=99),
                       1, 8.0)],
                     columns=["event_id", "ts", "user_id", "_prev_ts"]),
        "event_id long, ts timestamp, user_id long, _prev_ts double")
    out = sessionize(ev, "user_id", "ts", 30, "event_id")
    assert "_prev_ts" in out.columns
    got = {r["event_id"]: r for r in out.collect()}
    assert got[0]["_prev_ts"] == 7.0 and got[1]["_prev_ts"] == 8.0
    assert got[1]["session_idx"] == 2

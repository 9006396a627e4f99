"""Gap-based sessionization — the batch twin of the streaming session
tracker (streaming/stateful.py), and the operator that splits long-running
agent/conversation event streams into sessions for training-data assembly.

Scale shape: ONE shuffle on the entity key (the window partition), then
pure window arithmetic — the classic distributed sessionization plan:

    lag(ts) over (entity order by ts)          -- previous event time
    new_session = gap > threshold OR first     -- boundary flag
    session_idx = sum(new_session) over (...)  -- running boundary count

No UDFs, no state store, no driver round-trips; at 10^12 events the only
cost is the shuffle on entity, and AQE handles entity skew (one hot user's
events land in one partition, which is inherent to the semantics — the
window needs the entity's full ordered history; hot entities beyond one
partition's capacity belong to the streaming tracker, which bounds state
by watermark instead).

The reference has no event analytics (single-document tool); this is part
of the beyond-parity training-data surface (SURVEY §2 extras), directly
reusable on transcripts: sessionize(turns, "conv_id", "ts") splits a
months-long agent conversation into training-window sessions.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, entity_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0,
               tiebreak_col: str | None = None) -> DataFrame:
    """Assign a session index per entity: a new session starts when the
    gap since the entity's previous event exceeds ``gap_minutes``.

    Adds (session_idx, session_id, is_session_start). session_idx is
    1-based per entity in time order; session_id is the content-addressed
    string "<entity>#<idx>" — stable across reruns, repartitions, and
    cluster sizes (never a monotonically_increasing_id, whose value
    depends on partition layout).

    ``tiebreak_col`` breaks ordering ties for equal timestamps (pass the
    event id); without it, equal-ts rows order arbitrarily and the
    boundary flags could differ between runs."""
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    # collision-proof temp name: an input that already carries a column
    # with this name must not be silently overwritten then dropped
    tmp = "_prev_ts"
    while tmp in df.columns:
        tmp += "_"
    # exact microsecond gap via timestampdiff: timezone-free (works for
    # TIMESTAMP and TIMESTAMP_NTZ alike) and integer-exact, so the
    # boundary decision is engine-reproducible at full precision (a
    # seconds-granularity cast would truncate fractional seconds and make
    # the threshold comparison depend on sub-second phase)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = F.expr(f"timestampdiff(MICROSECOND, `{tmp}`, `{ts_col}`)")
    new_session = F.when(F.col(tmp).isNull()
                         | (gap_us > int(gap_minutes * 60 * 1_000_000)),
                         1).otherwise(0)
    return (df.withColumn(tmp, prev)
              .withColumn("is_session_start", new_session == 1)
              .withColumn("session_idx",
                          F.sum(new_session).over(
                              w.rowsBetween(Window.unboundedPreceding, 0)))
              .withColumn("session_id",
                          F.concat_ws("#", F.col(entity_col).cast("string"),
                                      F.col("session_idx").cast("string")))
              .drop(tmp))


def session_stats(df: DataFrame, entity_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: float = 30.0,
                  tiebreak_col: str | None = None,
                  value_col: str | None = None) -> DataFrame:
    """Per-session rollup: event count, start/end, duration. One extra
    partial-aggregated shuffle on (entity, session_idx) after the
    sessionize window — at scale the groupBy key extends the window's
    partitioning, so AQE usually plans it shuffle-free."""
    s = sessionize(df, entity_col, ts_col, gap_minutes, tiebreak_col)
    aggs = [F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (F.expr(f"timestampdiff(MICROSECOND, min({ts_col}), "
                    f"max({ts_col}))") / F.lit(1_000_000))
            .cast("long").alias("duration_s")]
    if value_col is not None:
        # exact decimal sum, NOT round(sum(double), 6): double partials
        # accumulate in scheduling-dependent order, and a fixture whose
        # session sums sit one ulp from a 1e-6 boundary flips the 6th
        # decimal between runs (round-5 driver flake). Quantizing each
        # value to micro precision first makes the sum associative-exact
        # and the digest stable at any parallelism; cast back to double so
        # the output schema is unchanged. Oracle twin:
        # sum(value::DECIMAL(18,6))::DOUBLE.
        aggs.append(F.sum(F.col(value_col).cast("decimal(18,6)"))
                    .cast("double").alias("sum_value"))
    return (s.groupBy(F.col(entity_col), F.col("session_idx"),
                      F.col("session_id"))
             .agg(*aggs))

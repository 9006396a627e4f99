"""Temporal joins Spark lacks as built-ins: as-of join and range join.

No reference counterpart (docext is a single-document tool); these are
the canonical event/transcript operators a 100 TB analytics engine needs
(join each event to the latest config/model/price state; join events
into alert/session windows).

Both are compositions of existing DataFrame ops chosen for their scale
shape — NO non-equi join ever reaches the planner (Spark would fall back
to BroadcastNestedLoopJoin / cartesian for one):

  * as-of join: the union-window formulation (Flint / tempo lineage) —
    tag both sides, union, one window per entity ordered by (ts, side),
    ``last(right_payload, ignorenulls=True)`` carries the most recent
    right row forward onto each left row. ONE shuffle on the entity key,
    zero row amplification, and skew behaves like any window (a hot
    entity is one partition's sort, not a join explosion).
  * range join: time-binning — intervals explode onto the fixed-width
    bins they cover, points map to their single bin, candidates meet in
    an EQUI-join on (entity, bin) and an exact predicate filters them.
    Row amplification is bounded by interval_length / bin_width (guarded:
    ``max_bins_per_interval`` fails loudly instead of exploding), so the
    shuffle stays proportional to the data, never to the key-pair count.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              tolerance_us: int | None = None,
              suffix: str = "_matched",
              direction: str = "backward") -> DataFrame:
    """As-of join: each left row gains one right row for the same ``on``
    keys (NULLs when none) — ``direction="backward"`` (default) the row
    with the greatest ``right_ts`` <= ``left_ts`` (DuckDB's
    ``ASOF LEFT JOIN ... l.ts >= r.ts``), ``"forward"`` the row with the
    smallest ``right_ts`` >= ``left_ts``. Ties on the timestamp match
    the right row (inclusive) in both directions.

    Output: every left column, then ``<right_ts><suffix>`` plus each of
    ``right_cols`` as ``<col><suffix>``. ``tolerance_us`` (microseconds)
    voids matches further than the bound in the match direction — the
    match columns go NULL, the left row stays.

    Contract: (on, right_ts) must be unique on the right side — with
    duplicate right timestamps the carried row depends on the sort's
    scheduling order. Pre-aggregate duplicates away (the oracle query
    does: one max_by row per (key, ts)).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    right_cols = right_cols or [c for c in right.columns
                                if c not in set(on) | {right_ts}]
    payload = F.struct(F.col(right_ts).alias("__rts"),
                       *[F.col(c) for c in right_cols])
    r = right.select(*on, F.col(right_ts).alias("__ts"),
                     F.lit(0).alias("__side"), payload.alias("__r"))
    l = left.select(*on, F.col(left_ts).alias("__ts"),
                    F.lit(1).alias("__side"),
                    F.struct(*[F.col(c) for c in left.columns])
                     .alias("__l"))
    # allowMissingColumns fills the absent struct with NULL on each side;
    # at equal ts the right row sorts first (__side 0 < 1) so an exact-ts
    # state change is visible to the event that carries its timestamp —
    # in both scan directions
    u = l.unionByName(r, allowMissingColumns=True)
    ts_order = (F.col("__ts").asc() if direction == "backward"
                else F.col("__ts").desc())
    w = (Window.partitionBy(*on).orderBy(ts_order, F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    if tolerance_us is not None:
        # timestampdiff is exact at microseconds and accepts both
        # TIMESTAMP and TIMESTAMP_NTZ (unix_micros rejects NTZ)
        gap = ("timestampdiff(MICROSECOND, __m.__rts, __ts)"
               if direction == "backward"
               else "timestampdiff(MICROSECOND, __ts, __m.__rts)")
        matched = matched.withColumn(
            "__m", F.when(F.expr(gap) <= F.lit(tolerance_us),
                          F.col("__m")))
    matched = matched.filter(F.col("__side") == 1)
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__rts").alias(f"{right_ts}{suffix}"))
    out_cols += [F.col(f"__m.{c}").alias(f"{c}{suffix}")
                 for c in right_cols]
    return matched.select(*out_cols)


def _micros(df: DataFrame, colname: str) -> Column:
    """Exact epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ columns
    (unix_micros rejects NTZ; a double cast would round sub-second
    digits). For NTZ the anchor is the NTZ epoch — the same wall-clock
    number DuckDB's epoch_us gives for its tz-free TIMESTAMP."""
    if dict(df.dtypes).get(colname) == "timestamp_ntz":
        return F.expr("timestampdiff(MICROSECOND, "
                      f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{colname}`)")
    return F.unix_micros(F.col(colname))


def range_join(points: DataFrame, intervals: DataFrame, on: list[str],
               point_ts: str = "ts", start_col: str = "start",
               end_col: str = "end", bin_width_us: int = 600_000_000,
               max_bins_per_interval: int = 1000) -> DataFrame:
    """Interval containment join: every (point, interval) pair with equal
    ``on`` keys and ``start <= point_ts < end`` (half-open, the event-
    window convention). Output: all point columns then all interval
    columns (names must not collide apart from ``on``).

    ``bin_width_us`` trades shuffle width against amplification — pick it
    near the typical interval length so most intervals land on 1-2 bins.
    An interval covering more than ``max_bins_per_interval`` bins raises
    at execution (a year-long interval against 1-second bins is a config
    error, not a workload): the explode is the ONLY amplification in the
    plan and this bounds it.
    """
    p = points.withColumn(
        "__bin", F.floor(_micros(points, point_ts) / F.lit(bin_width_us)))
    first_bin = F.floor(_micros(intervals, start_col) / F.lit(bin_width_us))
    # end is exclusive: the last covered instant is end - 1 microsecond
    last_bin = F.floor((_micros(intervals, end_col) - 1)
                       / F.lit(bin_width_us))
    span = last_bin - first_bin + 1
    guarded = F.when(
        span > max_bins_per_interval,
        F.raise_error(F.format_string(
            "range_join: interval covers %s bins > max_bins_per_interval"
            "=%s — widen bin_width_us or split the interval",
            span.cast("string"),
            F.lit(str(max_bins_per_interval))))
    ).otherwise(span)
    i = (intervals
         .filter(F.col(start_col) < F.col(end_col))  # empty → no bins
         .withColumn("__bin", F.explode(F.sequence(
             first_bin, first_bin + guarded - 1))))
    joined = p.join(i, on=[*on, "__bin"])
    return (joined
            .filter((F.col(start_col) <= F.col(point_ts))
                    & (F.col(point_ts) < F.col(end_col)))
            .drop("__bin"))

"""Sequence packing — fill fixed-capacity training sequences with
variable-length samples (the step after plans/training.py's sample
emission: trainers consume fixed-length token buffers, and padding waste
is real money at 100 TB).

Distributed shape: samples are hashed into ``n_groups`` independent
packing groups (content-addressed — the same corpus packs identically on
any cluster), each group packs SEQUENTIALLY inside one applyInPandas
task. Packing is inherently order-dependent state, so the honest scale
design is bounded per-group state + embarrassing parallelism across
groups, not a fake "windowed" packing that silently overflows bins. With
10^4 groups, each task holds one group's (id, len) pairs — thousands of
rows — never the corpus.

Strategies:
- ``nextfit`` (default): sort by (len DESC, id), walk once, open a new
  bin when the item doesn't fit. Deterministic AND SQL-replayable — the
  DuckDB oracle replays it with a rank-synchronized recursive CTE (one
  recursion step per within-group rank, all groups advancing in
  lockstep), so the driver hash-gates every bin assignment.
- ``ffd`` (first-fit-decreasing): same order, but each item scans all
  open bins and takes the first with room — tighter packing (classic
  11/9·OPT bound vs next-fit's 2·OPT), at O(items × bins) per group.
  Gated by an exact pure-Python twin in pytest (the sequential state is
  not reasonably SQL-expressible).

An item larger than ``capacity`` gets a bin of its own, flagged via
``oversize`` — never dropped silently, mirroring the decode-bomb guard
observability pattern.
"""
from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docext_spark.operators.sampling import hash_unit

PACK_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("length", T.LongType()),
    T.StructField("grp", T.IntegerType()),
    T.StructField("rank", T.IntegerType()),
    T.StructField("bin_idx", T.IntegerType()),
    T.StructField("bin_fill_after", T.LongType()),
    T.StructField("oversize", T.BooleanType()),
])


def pack_group(pdf: pd.DataFrame, capacity: int, strategy: str) -> pd.DataFrame:
    """Pack ONE group (plain pandas — shared by the Spark task and the
    pytest twin). Input: (id, length, grp); output: PACK_SCHEMA rows."""
    pdf = pdf.sort_values(["length", "id"],
                          ascending=[False, True], kind="mergesort")
    ranks, bins, fills, overs = [], [], [], []
    if strategy == "nextfit":
        bin_idx, fill = -1, 0
        for rk, ln in enumerate(pdf["length"], start=1):
            ln = int(ln)
            if bin_idx < 0 or fill + ln > capacity:
                bin_idx += 1
                fill = ln
            else:
                fill += ln
            ranks.append(rk)
            bins.append(bin_idx)
            fills.append(fill)
            overs.append(ln > capacity)
    elif strategy == "ffd":
        open_fill: list[int] = []          # fill per open bin
        for rk, ln in enumerate(pdf["length"], start=1):
            ln = int(ln)
            for b, f in enumerate(open_fill):
                if f + ln <= capacity:
                    open_fill[b] = f + ln
                    bins.append(b)
                    fills.append(open_fill[b])
                    break
            else:
                open_fill.append(ln)
                bins.append(len(open_fill) - 1)
                fills.append(ln)
            ranks.append(rk)
            overs.append(ln > capacity)
    else:
        raise ValueError(f"unknown strategy: {strategy!r} (nextfit | ffd)")
    out = pdf[["id", "length", "grp"]].copy()
    out["rank"] = ranks
    out["bin_idx"] = bins
    out["bin_fill_after"] = fills
    out["oversize"] = overs
    return out


def pack_sequences(df: DataFrame, capacity: int,
                   id_col: str = "sample_id", len_col: str = "n_tokens",
                   n_groups: int = 64, strategy: str = "nextfit",
                   seed: int = 0) -> DataFrame:
    """(id, length, grp, rank, bin_idx, bin_fill_after, oversize) — one
    row per input sample; join back on id for the payload. bin identity
    is (grp, bin_idx), content-addressed and cluster-size-independent.

    ``id_col`` values must be NON-NULL and UNIQUE (like hash_unit's
    contract): a NULL id would hash every such row into one shared group
    slot, and duplicate ids would share a single deterministic draw —
    both silently corrupt the oracle-pinned bin assignment, so they fail
    loudly here instead."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive: {capacity}")
    if strategy not in ("nextfit", "ffd"):
        raise ValueError(f"unknown strategy: {strategy!r} (nextfit | ffd)")
    items = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.coalesce(F.col(len_col).cast("long"), F.lit(0)).alias("length"),
        F.floor(hash_unit(F.col(id_col), seed, "sha256")
                * n_groups).cast("int").alias("grp"))
    # null ids fail loudly at scan time (JVM-side, no extra action); dup
    # ids fail inside the task below — equal ids always hash to the SAME
    # group, so the per-group check is complete without a global shuffle
    items = items.withColumn(
        "id", F.when(F.col("id").isNull(),
                     F.raise_error(F.lit(
                         "pack_sequences: null sample id (ids must be "
                         "non-null and unique)"))).otherwise(F.col("id")))

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        dup = pdf["id"].duplicated()
        if dup.any():
            raise ValueError(
                "pack_sequences: duplicate sample ids: "
                + ", ".join(sorted(pdf.loc[dup, "id"].unique()[:5])))
        return pack_group(pdf, capacity, strategy)

    return items.groupBy("grp").applyInPandas(_pack, PACK_SCHEMA)


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """One-row audit: bins, items, fill ratio, oversize count — the
    padding-waste number a pipeline operator actually watches."""
    per_bin = (packed.groupBy("grp", "bin_idx")
               .agg(F.max("bin_fill_after").alias("fill"),
                    F.count(F.lit(1)).alias("n_items"),
                    F.max(F.col("oversize").cast("int")).alias("has_oversize")))
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_items").alias("n_items"),
        F.sum("fill").alias("total_tokens"),
        # deterministic despite the double round: the sum is over LONGs
        # (integer addition is exact and associative at any partition
        # order), and the single long/long division is one IEEE op — no
        # scheduling-dependent double accumulation here (r5 verdict #1
        # sweep: exempt, unlike round(sum(double)) sites)
        F.round(F.sum(F.least(F.col("fill"), F.lit(capacity)))
                / (F.count(F.lit(1)) * capacity), 6).alias("fill_ratio"),
        F.sum("has_oversize").alias("n_oversize_bins"))

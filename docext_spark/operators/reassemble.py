"""W1 — stable conversation reassembly with skew-safe two-phase aggregation.

The invariant (BASELINE.json north rule): per-turn text equality under
stable turn ordering — turns concatenate in ``turn_idx`` order regardless of
physical row order, mirroring the reference's per-page concatenation
(pdf2md.py:100-137).

Skew: one hot conversation can dominate a partition (FIXTURES.md: 50× median
turns). ``reassemble_conversations(salted=True)`` aggregates in two phases —
phase 1 groups by (conv_id, salt) so a hot conversation's turns spread over
SALT_BUCKETS reducers, phase 2 merges the per-salt partial arrays — then one
ordered flatten restores exact order. Results are identical to the unsalted
path (asserted in tests), only the shuffle shape changes.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_BUCKETS = 16


def _with_header(arr_col):
    """array<struct<turn_idx, md>> (sorted) → conversation markdown with the
    reference's per-page header format (pdf2md.py:126-135)."""
    n = F.size(arr_col)
    parts = F.transform(
        arr_col,
        lambda x, i: F.concat_ws(
            "", F.lit("Page "), (i + 1).cast("string"), F.lit(" of "),
            n.cast("string"), F.lit("\n"), x["md"]))
    return F.array_join(parts, "\n")


def reassemble_conversations(turns: DataFrame, salted: bool = True) -> DataFrame:
    """(conv_id, turn_idx, md, ...) → (conv_id, n_turns, conv_md)."""
    base = turns.select("conv_id", "turn_idx", "md")
    if salted:
        partial = (base
                   .withColumn("salt", F.pmod(F.col("turn_idx"), F.lit(SALT_BUCKETS)))
                   .groupBy("conv_id", "salt")
                   .agg(F.collect_list(F.struct("turn_idx", "md")).alias("part")))
        merged = (partial.groupBy("conv_id")
                  .agg(F.flatten(F.collect_list("part")).alias("parts")))
    else:
        merged = (base.groupBy("conv_id")
                  .agg(F.collect_list(F.struct("turn_idx", "md")).alias("parts")))
    ordered = merged.withColumn("parts", F.array_sort("parts"))
    return ordered.select(
        "conv_id",
        F.size("parts").alias("n_turns"),
        _with_header(F.col("parts")).alias("conv_md"))

"""Sequence packing: hand-computed next-fit walks, FFD vs the pure-pandas
twin, capacity invariants, oversize flagging, and the stats rollup."""
from __future__ import annotations

import pandas as pd
import pytest

from docext_spark.operators.packing import (pack_group, pack_sequences,
                                            packing_stats)


def _items(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["sample_id", "n_tokens"]),
        "sample_id string, n_tokens long")


def test_nextfit_hand_computed(spark):
    # one group: lengths sorted desc = 60, 40, 30, 20 with capacity 70:
    # bin0 = [60], bin1 = [40, 30], bin2 = [20]
    df = _items(spark, [("a", 40), ("b", 60), ("c", 20), ("d", 30)])
    out = {r["id"]: (r["bin_idx"], r["bin_fill_after"])
           for r in pack_sequences(df, 70, n_groups=1).collect()}
    assert out == {"b": (0, 60), "a": (1, 40), "d": (1, 70), "c": (2, 20)}


def test_ffd_packs_tighter_than_nextfit(spark):
    # lengths 50, 40, 30, 25, 15 with capacity 70:
    # next-fit: [50], [40, 30], [25, 15]        -> 3 bins
    # ffd:      [50, 15], [40, 30], [25]        -> 3 bins... use a case
    # where they differ: 60, 35, 30, 10, cap 70:
    # next-fit: [60], [35, 30], [10] -> wait 35+30=65, +10 > 70 -> [10] = 3 bins
    # ffd: [60, 10], [35, 30] -> 2 bins
    df = _items(spark, [("a", 60), ("b", 35), ("c", 30), ("d", 10)])
    nf = pack_sequences(df, 70, n_groups=1, strategy="nextfit")
    fd = pack_sequences(df, 70, n_groups=1, strategy="ffd")
    assert nf.select("bin_idx").distinct().count() == 3
    assert fd.select("bin_idx").distinct().count() == 2


def test_capacity_never_exceeded_except_oversize(spark):
    import random
    rng = random.Random(3)
    rows = [(f"s{i}", rng.randint(1, 120)) for i in range(400)]
    for strategy in ("nextfit", "ffd"):
        packed = pack_sequences(_items(spark, rows), 100, n_groups=8,
                                strategy=strategy).collect()
        fills = {}
        for r in packed:
            fills[(r["grp"], r["bin_idx"])] = max(
                fills.get((r["grp"], r["bin_idx"]), 0), r["bin_fill_after"])
            assert r["oversize"] == (r["length"] > 100)
        over_bins = {(r["grp"], r["bin_idx"]) for r in packed if r["oversize"]}
        for key, fill in fills.items():
            if key not in over_bins:
                assert fill <= 100, key
        # every sample appears exactly once
        assert len(packed) == 400
        assert len({r["id"] for r in packed}) == 400


def test_ffd_matches_pure_pandas_twin(spark):
    """The Spark FFD path is the same pack_group function applied per
    group — assert the distributed result equals a driver-side replay of
    the identical grouping."""
    import random
    rng = random.Random(9)
    rows = [(f"d{i}", rng.randint(1, 90)) for i in range(200)]
    df = _items(spark, rows)
    got = {(r["id"]): (r["grp"], r["rank"], r["bin_idx"])
           for r in pack_sequences(df, 100, n_groups=4,
                                   strategy="ffd").collect()}
    # driver-side twin: same hash grouping read back, then pack_group
    items = (pack_sequences(df, 100, n_groups=4, strategy="ffd")
             .select("id", "length", "grp").toPandas())
    for g in sorted(items["grp"].unique()):
        twin = pack_group(items[items["grp"] == g], 100, "ffd")
        for _, row in twin.iterrows():
            assert got[row["id"]] == (g, row["rank"], row["bin_idx"])


def test_packing_stats_rollup(spark):
    df = _items(spark, [("a", 60), ("b", 35), ("c", 30), ("d", 150)])
    packed = pack_sequences(df, 70, n_groups=1)
    row = packing_stats(packed, 70).collect()[0]
    assert row["n_items"] == 4
    assert row["n_oversize_bins"] == 1
    assert row["total_tokens"] == 275
    assert 0 < row["fill_ratio"] <= 1.0


def test_rejects_bad_args(spark):
    df = _items(spark, [("a", 1)])
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(df, 0)
    with pytest.raises(ValueError, match="strategy"):
        pack_sequences(df, 10, strategy="bogus")

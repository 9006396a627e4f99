"""Physical-plan gates: the scale-posture claims in BENCH/PLANS.md as
enforced assertions, so a regression (a sneaky total sort, a cartesian, a
shuffled hot-set filter) fails CI instead of only dating the doc."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
pytestmark = pytest.mark.skipif(not os.path.isdir(SF),
                                reason="driver testdata not present")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_x4_kie_has_no_total_sort(spark):
    import __spark_entry__ as entry
    plan = _plan(entry.queries()["x4_kie_fields"](spark, SF))
    assert "Sort" not in plan  # display sort is opt-in, not in the oracle path


def test_capped_jaccard_hot_filter_is_broadcast_anti(spark):
    from docext_spark.operators.dedup import capped_shingle_table, shingle_table
    sh = shingle_table(_docs(spark))
    plan = _plan(capped_shingle_table(sh, 10))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the hot-set filter must not shuffle the shingle table
    assert "SortMergeJoin" not in plan


def test_cosine_lsh_has_no_cartesian(spark):
    from docext_spark.operators.similarity import embedding_near_dups
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .withColumn("embedding", F.col("embedding").cast("array<double>")))
    plan = _plan(embedding_near_dups(emb, threshold=0.8, dim=64,
                                     n_planes=8, n_tables=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # while the exact baseline IS the (documented) cartesian
    exact_plan = _plan(embedding_near_dups(emb, threshold=0.8, exact=True))
    assert ("CartesianProduct" in exact_plan
            or "BroadcastNestedLoopJoin" in exact_plan)


def test_extraction_scan_prunes_columns(spark):
    """Column pruning must reach the parquet scan THROUGH the pUDF."""
    import __spark_entry__ as entry
    plan = _plan(entry.queries()["x1_turn_markdown"](spark, SF))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "source" not in scan[0]  # unreferenced column pruned


def test_q5_dims_broadcast(spark):
    import __spark_entry__ as entry
    plan = _plan(entry.queries()["q5_revenue_by_nation"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3

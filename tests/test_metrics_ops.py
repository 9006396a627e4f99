"""Metric operators on tiny in-memory frames — reference edge semantics:
both-empty → 1.0 (kie.py:28-29), missing pred label → "" (kie.py:20-22),
multi-answer max (vqa.py:48-57), exact match (classification.py:21-24)."""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from docext_spark.operators.metrics import (align_pred_gt, edit_similarity,
                                            exact_match_accuracy, kie_score,
                                            multivalue_fold, score_matrix,
                                            stratified_topk, vqa_best_of)


def test_edit_similarity_edges(spark):
    df = spark.createDataFrame(
        [("", ""), ("abc", "abc"), ("abc", ""), ("kitten", "sitting"), (None, "x")],
        "pred string, gt string")
    sims = [r[0] for r in
            df.select(edit_similarity(F.col("pred"), F.col("gt"))).collect()]
    assert sims[0] == 1.0          # both empty → 1.0
    assert sims[1] == 1.0
    assert sims[2] == 0.0
    assert math.isclose(sims[3], 1 - 3 / 7)
    assert sims[4] == 0.0          # null treated as ""


def test_align_first_match_and_default(spark):
    gt = spark.createDataFrame(
        [("d1", "amount", "100"), ("d1", "date", "2026-01-01"),
         ("d2", "amount", "7")],
        "doc_id string, label string, value string")
    pred = spark.createDataFrame(
        [("d1", "amount", "100", 2), ("d1", "amount", "999", 5),
         ("d2", "other", "x", 1)],
        "doc_id string, label string, value string, pos int")
    out = align_pred_gt(gt, pred, ["doc_id"], "label", "value", pos_col="pos")
    got = {(r["doc_id"], r["label"]): r["pred_value"] for r in out.collect()}
    assert got[("d1", "amount")] == "100"   # first match by pos wins
    assert got[("d1", "date")] == ""        # miss → ""
    assert got[("d2", "amount")] == ""
    score = out.agg(F.avg(edit_similarity(F.col("pred_value"),
                                          F.col("value")))).collect()[0][0]
    assert 0 < score < 1


def test_align_first_match_is_group_limit(spark):
    """r7: align_pred_gt's rn=1 must stay in the WindowGroupLimit form —
    the map-side per-key top-1 that prunes the shuffle to one row per
    (keys, label) (a min-struct aggregation degenerates to SortAggregate:
    struct buffers aren't hash-aggregatable)."""
    gt = spark.createDataFrame([("d1", "amount", "100")],
                               "doc_id string, label string, value string")
    pred = spark.createDataFrame(
        [("d1", "amount", "late", 5), ("d1", "amount", "early", 0)],
        "doc_id string, label string, value string, pos int")
    out = align_pred_gt(gt, pred, ["doc_id"], "label", "value",
                        pos_col="pos")
    assert out.collect()[0]["pred_value"] == "early"   # lowest pos wins
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "SortAggregate" not in plan


def test_vqa_best_of(spark):
    gt = spark.createDataFrame(
        [("d1", ["yes", "no"], "no"), ("d2", ["alpha"], "alpha")],
        "key string, answers array<string>, pred string")
    out = vqa_best_of(gt, ["key"]).collect()[0]["vqa_score"]
    assert out == 1.0  # best-of picks the exact-match answer per doc


def test_exact_match(spark):
    df = spark.createDataFrame([("a", "a"), ("a", "b"), (None, "")],
                               "gt string, pred string")
    acc = exact_match_accuracy(df, "gt", "pred").collect()[0]["accuracy"]
    assert math.isclose(acc, 2 / 3, abs_tol=1e-6)  # null == "" by coalesce


def test_multivalue_fold_order(spark):
    df = spark.createDataFrame(
        [("d1", "tag", "b", 2), ("d1", "tag", "a", 1), ("d2", "tag", "z", 1)],
        "doc_id string, label string, value string, pos int")
    out = multivalue_fold(df, ["doc_id"], "label", "value", "pos")
    got = {r["doc_id"]: r["values"] for r in out.collect()}
    assert got["d1"] == ["a", "b"]  # position-ordered, not value-ordered... pos 1 first
    assert got["d2"] == ["z"]


def test_score_matrix_pivot(spark):
    df = spark.createDataFrame(
        [("m1", "ds1", 0.9), ("m1", "ds2", 0.7), ("m2", "ds1", 0.5),
         ("m2", "ds2", 0.5)],
        "model string, dataset string, score double")
    out = score_matrix(df).collect()
    assert out[0]["model"] == "m1"  # sorted by average desc
    assert math.isclose(out[0]["average"], 0.8)


def test_stratified_topk(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(20)],
        "id int, cls string")
    out = stratified_topk(df, "cls", "id", 3)
    assert out.count() == 6
    per = {r["cls"] for r in out.collect()}
    assert per == {"a", "b"}


def test_grits_clipped_udf_flags_oversize_tables(spark):
    import pandas as pd

    from docext_spark.operators.extract import grits_clipped_udf, grits_con_udf
    from pyspark.sql import functions as F
    big = ("<table>"
           + "".join("<tr>" + "<td>x</td>" * 80 + "</tr>" for _ in range(80))
           + "</table>")
    small = "<table><tr><td>a</td></tr></table>"
    df = spark.createDataFrame(
        pd.DataFrame([(0, small, small), (1, big, big)],
                     columns=["i", "gt", "pred"]),
        "i long, gt string, pred string")
    out = (df.select("i", grits_clipped_udf("gt", "pred").alias("clipped"),
                     grits_con_udf("gt", "pred").alias("score"))
           .collect())
    got = {r["i"]: (r["clipped"], r["score"]) for r in out}
    assert got[0] == (False, 1.0)
    assert got[1][0] is True and got[1][1] == 1.0
    # the lineage counter shape: sum of clipped flags
    n = df.agg(F.sum(grits_clipped_udf("gt", "pred").cast("int"))).collect()
    assert n[0][0] == 1


def test_approx_percentiles_error_bounded(spark):
    """percentile_approx(accuracy=1000) must land within 5% relative
    error of the exact percentile on the sf0.01 documents table (the
    HLL-style accuracy gate for the rows-only sketch query; the sketch
    returns an actual data element while the exact form interpolates, so
    the bound absorbs one inter-element gap on top of sketch error)."""
    import __spark_entry__ as entry
    rows = entry.queries()["approx_percentiles"](
        spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        for a, e in (("ap50", "ex50"), ("ap99", "ex99")):
            assert abs(r[a] - r[e]) <= max(0.05 * r[e], 3.0), (r["lang"], a)

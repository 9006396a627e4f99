"""The IDP-benchmark engine rebuilt on Spark (reference lifecycle:
/root/reference/docext/benchmark/benchmark.py:287-535 — per (dataset, task):
run the model, parse, align pred↔gt, score with the task metric, then pivot
to the accuracy matrix benchmark.py:301-316).

Here the "model" is the native extraction pipeline; scoring is all native
expressions; the fan-out over datasets×tasks is one DataFrame union, not a
thread pool.

Fixture shape (FIXTURES.md §3-§5): one `fixtures` table
  (doc_id string, task string, text string, gt string,
   gt_answers array<string>, labels array<string>, gt_html string,
   pred_html string)
tasks: KIE | OCR | VQA | CLASSIFICATION | TABLE.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docext_spark.operators.extract import (grits_con_udf, make_classify_udf,
                                            make_fields_udf, turn_extract_udf)
from docext_spark.operators.metrics import edit_similarity

KIE_FIELDS = ["invoice_number", "buyer_name", "invoice_amount"]
CLS_LABELS = ["invoice", "receipt", "passport", "report"]
TASKS = ["CLASSIFICATION", "KIE", "OCR", "TABLE", "VQA"]


# unrounded partition-order-independent mean: score_benchmark rounds once
# at the end; the decimal quantization scale has ONE home in metrics.py
from docext_spark.operators.metrics import det_mean_raw as _davg  # noqa: E402


def score_benchmark(fixtures: DataFrame) -> DataFrame:
    """Run + score every task; returns (task, score, n_docs)."""
    fixtures = fixtures.cache()

    # KIE: extract requested fields, align by label, mean edit-similarity
    # (kie.py:11-32; missing → "", extract.py:89)
    kie_udf = make_fields_udf(KIE_FIELDS)
    kie = (fixtures.filter(F.col("task") == "KIE")
           .withColumn("f", F.explode(kie_udf(F.col("text"))))
           .select("doc_id", F.col("f.field").alias("field"),
                   F.col("f.answer").alias("pred")))
    kie_gt = (fixtures.filter(F.col("task") == "KIE")
              .select("doc_id", F.explode(F.from_json(
                  "gt", "array<struct<label:string,value:string>>")).alias("g"))
              .select("doc_id", F.col("g.label").alias("field"),
                      F.col("g.value").alias("gt_value")))
    kie_scored = (kie_gt.join(kie, ["doc_id", "field"], "left")
                  .withColumn("pred", F.coalesce("pred", F.lit("")))
                  .agg(_davg(edit_similarity(F.col("pred"), F.col("gt_value")))
                        .alias("score"),
                       F.countDistinct("doc_id").alias("n_docs"))
                  .select(F.lit("KIE").alias("task"), "score", "n_docs"))

    # OCR: markdown-convert the payload, edit-similarity vs gt text
    # (ocr.py:10-28)
    ocr = (fixtures.filter(F.col("task") == "OCR")
           .withColumn("pred", turn_extract_udf(F.col("text"))["md"])
           .agg(_davg(edit_similarity(F.col("pred"), F.col("gt"))).alias("score"),
                F.countDistinct("doc_id").alias("n_docs"))
           .select(F.lit("OCR").alias("task"), "score", "n_docs"))

    # VQA: best-of over gt answer list (vqa.py:36-58); pred = first KIE-style
    # answer line in the payload
    vqa_udf = make_fields_udf(["answer"])
    vqa = (fixtures.filter(F.col("task") == "VQA")
           .withColumn("pred", F.element_at(vqa_udf(F.col("text")), 1)["answer"])
           .withColumn("ans", F.explode("gt_answers"))
           .groupBy("doc_id", "pred")
           .agg(F.max(edit_similarity(F.col("pred"), F.col("ans"))).alias("best"))
           .agg(_davg(F.col("best")).alias("score"),
                F.count(F.lit(1)).alias("n_docs"))
           .select(F.lit("VQA").alias("task"), "score", "n_docs"))

    # CLASSIFICATION: exact match (classification.py:6-26)
    cls_udf = make_classify_udf(CLS_LABELS)
    cls = (fixtures.filter(F.col("task") == "CLASSIFICATION")
           .withColumn("pred", cls_udf(F.col("text")))
           .agg(_davg((F.col("pred") == F.col("gt")).cast("double")).alias("score"),
                F.count(F.lit(1)).alias("n_docs"))
           .select(F.lit("CLASSIFICATION").alias("task"), "score", "n_docs"))

    # TABLE: GRITS_Con between gt and pred HTML (tables.py:9-22)
    tbl = (fixtures.filter(F.col("task") == "TABLE")
           .withColumn("g", grits_con_udf(F.col("gt_html"), F.col("pred_html")))
           .agg(_davg(F.col("g")).alias("score"), F.count(F.lit(1)).alias("n_docs"))
           .select(F.lit("TABLE").alias("task"), "score", "n_docs"))

    return (kie_scored.unionByName(ocr).unionByName(vqa)
            .unionByName(cls).unionByName(tbl)
            .withColumn("score", F.round("score", 6)))


def accuracy_matrix(scores: DataFrame, model: str = "native",
                    tasks: list[str] | None = None) -> DataFrame:
    """Pivot to the accuracy matrix + row average, sorted desc
    (benchmark.py:301-316). ``tasks`` gives the pivot columns explicitly;
    when omitted they are discovered from the data (``scores`` is a
    task-level aggregate — a handful of rows — so the distinct+collect is
    config-scale, not a data-scale driver round-trip). A caller-supplied
    list is validated against the scored tasks: a task present in the data
    but missing from the pivot columns must fail loudly, not silently
    vanish from the matrix and the average."""
    if tasks is None:
        tasks = [r["task"] for r in scores.select("task").distinct().collect()]
    else:
        # NULL-safe: `~isin` evaluates to NULL for a NULL task, which the
        # filter would drop — and the pivot would then silently drop those
        # rows too, the exact failure this guard exists to catch
        extra = (scores.filter(F.col("task").isNull()
                               | ~F.col("task").isin(list(tasks)))
                 .select("task").distinct().collect())
        if extra:
            raise ValueError(
                "accuracy_matrix: scored tasks not in pivot columns: "
                + ", ".join(sorted(str(r["task"]) for r in extra)))
    pivoted = (scores.withColumn("model", F.lit(model))
               .groupBy("model").pivot("task", sorted(tasks))
               .agg(F.first("score")))
    cols = [c for c in pivoted.columns if c != "model"]
    # average over the tasks actually SCORED (null pivot columns are
    # absent tasks, not zeros): a caller scoring 2 of the 5 tasks must
    # see the mean of those 2, exactly as when the pivot columns were
    # collected from the data
    n_present = sum(F.col(c).isNotNull().cast("int") for c in cols)
    avg = (sum(F.coalesce(F.col(c), F.lit(0.0)) for c in cols)
           / F.greatest(n_present, F.lit(1)))
    return (pivoted.withColumn("average", F.round(avg, 6))
            .orderBy(F.desc("average")))

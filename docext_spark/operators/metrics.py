"""A1-A12 — benchmark metric operators, all native Catalyst expressions.

Semantics mirror the reference metric modules exactly:
  * edit similarity: 1 - lev(pred, gt)/max(len), both-empty → 1.0
    (kie.py:11-32, ocr.py:10-28, vqa.py:10-33)
  * best-of multi-answer VQA: max similarity over gt answers (vqa.py:36-58)
  * exact match (classification.py:6-26)
  * pred↔gt label alignment: left join + coalesce("" ) + first-match dedupe
    (ds.py:89-95, kie.py:16-31)
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def edit_similarity(pred: Column, gt: Column) -> Column:
    """1 - levenshtein/max(len); 1.0 when both empty (kie.py:26-31)."""
    p = F.coalesce(pred, F.lit(""))
    g = F.coalesce(gt, F.lit(""))
    max_len = F.greatest(F.length(p), F.length(g))
    return F.when(max_len == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(p, g) / max_len)


def det_mean(col: Column, scale: int = 6) -> Column:
    """Partition-order-independent rounded mean of a double column.

    ``F.avg(double)`` sums partials in scheduling-dependent order, so when
    the true mean sits within one ulp of a 10^-scale rounding boundary the
    last digit — and any cross-engine value hash — can flip between runs
    (round-5 verdict #1: the event_sessionization driver flake). The fix:
    quantize each value to DECIMAL(28,12) (deterministic per row), sum
    exactly (decimal addition is associative — any partial-aggregation
    order yields the same digits), then do ONE double division and round.
    The DuckDB oracle twin is round(sum(x::DECIMAL(28,12))::DOUBLE /
    count(x), scale): both engines round decimal halves away from zero and
    cast sub-2^53 decimals to double identically (verified empirically).
    """
    return F.round(det_mean_raw(col), scale)


def det_mean_raw(col: Column) -> Column:
    """Unrounded det_mean: exact DECIMAL(28,12) sum + ONE double division —
    for callers that defer the rounding to the end of a larger expression
    (plans/benchmark.py score matrix). The quantization scale lives ONLY
    here and in det_sum."""
    return F.sum(col.cast("decimal(28,12)")).cast("double") / F.count(col)


def det_sum(col: Column, scale: int = 2,
            cast_type: str = "decimal(18,6)") -> Column:
    """Partition-order-independent rounded sum (same rationale as
    det_mean): exact decimal sum, round, cast back to double. Oracle twin:
    round(sum(x::DECIMAL(18,6)), scale)::DOUBLE. For hot large-table
    aggregates over KNOWN-finite-decimal inputs prefer det_sum_scaled —
    Spark's decimal aggregation runs ~3.5× slower than the codegen long
    path (measured r6 on the q1 aggregate)."""
    return F.round(F.sum(col.cast(cast_type)), scale).cast("double")


def det_sum_scaled(col: Column, frac_digits: int, scale: int = 2) -> Column:
    """Deterministic rounded sum for doubles carrying at most
    ``frac_digits`` fractional DECIMAL digits (money, quantities,
    fixed-point sensor values): quantize each row to LONG (exact — the
    scaled value sits within ~1e-7 of its integer, far from any rounding
    boundary), sum exactly (integer addition is associative, so any
    partial-aggregation order yields the same total, the det_* family's
    whole point), then ONE double division + round. Stays inside
    whole-stage codegen: measured ~2.5× faster than the decimal(18,6)
    path on the sf0.1 q1 aggregate (r6). Overflow bound:
    max|value|·10^frac · rows_per_group < 9.2e18 — money-scale values at
    frac=4 support ~8.8e9 rows per group, quantities at frac=2 ~9e12.
    Oracle twin: round(sum(round(x * 10^f)::BIGINT) / 10^f.0, scale)."""
    f = float(10 ** frac_digits)
    return F.round(F.sum(F.round(col * f).cast("long")) / f, scale)


def det_mean_scaled(col: Column, frac_digits: int, scale: int = 4) -> Column:
    """det_sum_scaled's mean sibling: exact long sum, one division by the
    scale, one by the non-null count, one round. Oracle twin:
    round(sum(round(x * 10^f)::BIGINT) / 10^f.0 / count(x), scale)."""
    f = float(10 ** frac_digits)
    return F.round(F.sum(F.round(col * f).cast("long")) / f / F.count(col),
                   scale)


def align_pred_gt(gt: DataFrame, pred: DataFrame,
                  keys: list[str], label_col: str = "label",
                  value_col: str = "value",
                  pos_col: str | None = None) -> DataFrame:
    """J1/W3 — for each GT (keys, label), the first matching pred value or "".

    First-match semantics via row_number over pred position
    (ds.py:92-95: the first pred field with the label wins). The rn=1
    filter is deliberately the WINDOW form, not a min-struct aggregation:
    Spark rewrites it to WindowGroupLimit, a map-side per-key top-1 that
    prunes the shuffle to one row per (keys, label) BEFORE the exchange,
    while min(struct(pos, value)) falls out of hash aggregation entirely
    (struct buffers aren't mutable → SortAggregate + an extra sort pass —
    measured 2.5× slower at sf1.0, r7).
    """
    join_cols = keys + [label_col]
    p = pred
    if pos_col is not None:
        w = Window.partitionBy(*join_cols).orderBy(pos_col)
        p = (p.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1).drop("_rn", pos_col))
    p = p.withColumnRenamed(value_col, "_pred_value")
    out = gt.join(p, join_cols, "left")
    return out.withColumn("pred_value",
                          F.coalesce(F.col("_pred_value"), F.lit(""))) \
              .drop("_pred_value")


def kie_score(aligned: DataFrame, gt_value: str = "value",
              pred_value: str = "pred_value") -> DataFrame:
    """A1 — mean normalized edit similarity over all aligned fields."""
    return (aligned
            .withColumn("_sim",
                        edit_similarity(F.col(pred_value), F.col(gt_value)))
            .agg(det_mean(F.col("_sim"), 6).alias("kie_score")))


def vqa_best_of(gt_answers: DataFrame, keys: list[str],
                answers_col: str = "answers",
                pred_col: str = "pred") -> DataFrame:
    """A3 — per doc: max edit similarity over the gt answer list, then mean."""
    exploded = gt_answers.withColumn("_ans", F.explode(F.col(answers_col)))
    per_doc = (exploded
               .groupBy(*keys)
               .agg(F.max(edit_similarity(F.col(pred_col), F.col("_ans")))
                     .alias("best_sim")))
    return per_doc.agg(det_mean(F.col("best_sim"), 6).alias("vqa_score"))


def exact_match_accuracy(df: DataFrame, gt_col: str, pred_col: str) -> DataFrame:
    """A4 — classification exact-match accuracy."""
    return df.agg(det_mean(
        (F.coalesce(F.col(gt_col), F.lit("")) ==
         F.coalesce(F.col(pred_col), F.lit(""))).cast("double"), 6)
        .alias("accuracy"))


def multivalue_fold(df: DataFrame, keys: list[str], label_col: str,
                    value_col: str, pos_col: str) -> DataFrame:
    """A5 — repeated labels per doc → ordered value list
    (docile.py:107-118; order-stable via sort on position)."""
    return (df.groupBy(*keys, label_col)
              .agg(F.array_sort(F.collect_list(F.struct(pos_col, value_col)))
                    .alias("_pairs"))
              .withColumn("values",
                          F.transform("_pairs", lambda s: s[value_col]))
              .drop("_pairs"))


def score_matrix(scores: DataFrame, row: str = "model", col: str = "dataset",
                 val: str = "score") -> DataFrame:
    """A10 — pivot to a score matrix + row average, sorted desc
    (benchmark.py:301-316)."""
    pivoted = scores.groupBy(row).pivot(col).agg(F.first(val))
    data_cols = [c for c in pivoted.columns if c != row]
    avg_expr = sum(F.coalesce(F.col(c), F.lit(0.0)) for c in data_cols) / len(data_cols)
    return (pivoted.withColumn("average", F.round(avg_expr, 6))
            .orderBy(F.desc("average")))


def stratified_topk(df: DataFrame, class_col: str, order_col: str,
                    k: int) -> DataFrame:
    """A11 — per class, first k by sorted id (nanonets_cls.py:40-55)."""
    w = Window.partitionBy(class_col).orderBy(order_col)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= k).drop("_rn"))

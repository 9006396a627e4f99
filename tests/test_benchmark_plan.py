"""End-to-end IDP-style fixture benchmark (SURVEY.md §5.2 item 4):
5 tasks scored through the native extractors, thresholds asserted."""
from __future__ import annotations

import pytest

from docext_spark.fixtures import fixtures_df
from docext_spark.plans.benchmark import accuracy_matrix, score_benchmark


@pytest.fixture(scope="module")
def scores(spark):
    fx = fixtures_df(spark, n_per_task=24)
    return {r["task"]: (r["score"], r["n_docs"])
            for r in score_benchmark(fx).collect()}


def test_all_tasks_scored(scores):
    assert set(scores) == {"KIE", "OCR", "VQA", "CLASSIFICATION", "TABLE"}
    assert all(n > 0 for _s, n in scores.values())


def test_planted_tasks_near_perfect(scores):
    # KIE/OCR/CLS inputs are exactly extractable → scores ~1.0
    assert scores["KIE"][0] == 1.0
    assert scores["OCR"][0] == 1.0
    assert scores["CLASSIFICATION"][0] == 1.0
    # VQA: exact answer is among gt answers → best-of = 1.0
    assert scores["VQA"][0] == 1.0


def test_table_perturbations_score_between(scores):
    # 1/4 identical (1.0), rest perturbed (<1.0) → strict bounds
    s = scores["TABLE"][0]
    assert 0.5 < s < 1.0


def test_accuracy_matrix_pivot(spark, scores):
    fx = fixtures_df(spark, n_per_task=12)
    mat = accuracy_matrix(score_benchmark(fx)).collect()
    assert len(mat) == 1
    row = mat[0].asDict()
    assert row["model"] == "native"
    assert 0.0 < row["average"] <= 1.0
    assert "TABLE" in row and "KIE" in row


def test_accuracy_matrix_rejects_unlisted_task(spark):
    """A task scored in the data but absent from a caller-supplied pivot
    list must fail loudly, not silently drop from the average (ADVICE r4)."""
    import pandas as pd
    scores = spark.createDataFrame(
        pd.DataFrame([("KIE", 0.9, 3), ("NEWTASK", 0.5, 2)],
                     columns=["task", "score", "n_docs"]),
        "task string, score double, n_docs long")
    with pytest.raises(ValueError, match="NEWTASK"):
        accuracy_matrix(scores, tasks=["KIE", "OCR"])


def test_accuracy_matrix_discovers_tasks_from_data(spark):
    import pandas as pd
    scores = spark.createDataFrame(
        pd.DataFrame([("KIE", 0.9, 3), ("NEWTASK", 0.5, 2)],
                     columns=["task", "score", "n_docs"]),
        "task string, score double, n_docs long")
    row = accuracy_matrix(scores).collect()[0].asDict()
    assert row["NEWTASK"] == 0.5
    assert abs(row["average"] - 0.7) < 1e-9

"""Dataset-loader transforms vs the reference converters' semantics
(/root/reference/docext/benchmark/vlm_datasets/*). Raw fixtures are
deterministic synthetic tables shaped like each dataset."""
from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from docext_spark.sources import loaders as L


def test_docile_bbox_denorm_and_multivalue_fold(spark):
    out = L.load_docile(L.synth_raw(spark, "docile", 3)).collect()
    assert len(out) == 3
    rows = {r["sample_id"]: r for r in out}
    fields = {f["label"]: f for f in rows[1]["fields"]}
    # relative [0.1, 0.2, 0.5, 0.4] on 1700x2200 → [170, 440, 850, 880]
    # (docile.py:90-102: rel * page_size, int cast)
    assert list(fields["invoice_no"]["bbox"]) == [170, 440, 850, 880]
    # repeated 'total' folds values in annotation order, first bbox kept
    # (docile.py:108-119); odd docs list total at seq 0,1, invoice_no at 2
    assert list(fields["total"]["values"]) == ["total-1-0", "total-1-1"]
    assert list(fields["invoice_no"]["values"]) == ["invoice_no-1-2"]
    assert rows[1]["extraction_type"] == "field" and rows[1]["task"] == "KIE"
    # field ORDER is first-occurrence (annotation) order, not label order:
    # doc 0 lists invoice_no first, doc 1 lists total first
    assert [f["label"] for f in rows[0]["fields"]] == ["invoice_no", "total"]
    assert [f["label"] for f in rows[1]["fields"]] == ["total", "invoice_no"]


def test_nanonets_cls_classwise_cap_and_sorted_labels(spark):
    raw = L.synth_raw(spark, "nanonets_cls", 30)  # 10 per class
    out = L.load_nanonets_cls(raw, max_samples=4).collect()
    per_class: dict = {}
    for r in out:
        per_class.setdefault(r["doc_type"], []).append(r["sample_id"])
        # class_labels = sorted distinct over the WHOLE split
        # (nanonets_cls.py:66 sorted(set(labels)))
        assert list(r["class_labels"]) == ["form", "invoice", "receipt"]
    # the cap keeps the LOWEST sample ids per class
    # (nanonets_cls.py:52 sorted_class_ids[:max_samples])
    for label, ids in per_class.items():
        assert len(ids) == 4
        assert sorted(ids) == sorted(
            i for i in range(30)
            if ["invoice", "receipt", "form"][i % 3] == label)[:4]


def test_chartqa_takes_first_label(spark):
    out = L.load_chartqa(L.synth_raw(spark, "chartqa", 2)).collect()
    assert [list(r["answers"]) for r in out] == [["0"], ["10"]]


def test_docvqa_keeps_all_answers(spark):
    out = L.load_docvqa(L.synth_raw(spark, "docvqa", 2)).collect()
    assert all(len(r["answers"]) == 2 for r in out)


def test_checkbox_key_remap_and_skips(spark):
    out = L.load_checkbox(
        L.synth_raw(spark, "handwritten_forms", 2)).collect()
    labels = {f["label"]: f["values"][0] for f in out[0]["fields"]}
    # remapped keys (checkbox.py:55-81)
    assert labels["name_of_deceased"] == "Person 0"
    assert labels["place_of_death_county"] == "County 0"
    assert labels["deceased_gender"] == "M"
    assert labels["father_name"] == "Father 0"
    # skipped noisy annotations: person.death, person_data.birth_day
    assert "death" not in labels and "birth_day" not in labels
    # absent sections/keys are skipped, not error'd
    assert "mother_name" not in labels


def test_longdocbench_two_insertion_points(spark):
    test_raw = L.synth_raw(spark, "longdocbench_test", 3)
    train_raw = L.synth_raw(spark, "longdocbench_train", 30)
    out = L.load_longdocbench(test_raw, train_raw,
                              additional_docs_count=20).collect()
    # 2 rows per sample (insertion points 30% and 60%,
    # longdocbench.py:139-143)
    assert len(out) == 6
    by_pos = {}
    for r in out:
        base_id = r["sample_id"] // 100
        pos = r["sample_id"] % 100
        refs = list(r["image_refs"])
        assert len(refs) == 21  # 20 distractors + the test page
        own = f"form_longdocbench_test_{base_id}.png"
        assert refs.count(own) == 1
        idx = refs.index(own)
        assert idx == int(20 * pos / 100)  # inserted at 30% / 60%
        by_pos.setdefault(base_id, set()).add(pos)
        # the asked field's answer never appears in the question context
        assert r["question"].startswith("Extract ")
        assert r["answers"][0] not in r["question"]
    assert all(v == {30, 60} for v in by_pos.values())


def test_ocr_variants(spark):
    plain = L.load_ocr_handwriting(L.synth_raw(spark, "ocr_hw", 3)).collect()
    assert plain[0]["ocr_text"].startswith("line ")
    rot = L.load_ocr_handwriting_rotated(
        L.synth_raw(spark, "ocr_hw_rot", 3)).collect()
    # rotated variant carries a deterministic angle in [-5, 5) per sample
    for r in rot:
        angle = int(r["image_refs"][0].split("#rot=")[1])
        assert -5 <= angle < 5
    dia = L.load_ocr_diacritics(L.synth_raw(spark, "ocr_dia", 2)).collect()
    assert dia[0]["ds_name"] == "digital_ocr_diacritics"


def test_tablebench_variants_and_grits_integration(spark):
    from docext_spark.core.tables import html_table_to_cells
    name = L.TABLEBENCH_VARIANTS[0]
    out = L.load_tablebench(L.synth_raw(spark, name, 2), name).collect()
    recs = json.loads(out[0]["table_json"])
    assert recs[0]["col_a"] == "a0" and len(recs) == 2
    with pytest.raises(ValueError, match="unknown tablebench variant"):
        L.load_tablebench(L.synth_raw(spark, name, 1), "nope")


def test_load_all_union_schema(spark):
    df = L.load_all(spark, n_per_ds=5)
    counts = {r["ds_name"]: r["n"] for r in
              df.groupBy("ds_name").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert len(counts) == 16  # 10 named + 6 tablebench variants
    assert counts["docile"] == 5
    assert counts["nanonets_longdocbench"] == 10  # 2 per sample
    assert set(df.columns) == {
        "ds_name", "task", "sample_id", "extraction_type", "image_refs",
        "fields", "question", "answers", "doc_type", "class_labels",
        "ocr_text", "table_json"}


def test_checkbox_malformed_ground_truth_is_total(spark):
    """Broken / absent JSON must yield empty fields, never an error row
    (the broken-payload contract applies to loaders too)."""
    rows = [(0, "x.png", "{broken ]["),
            (1, "y.png", None),
            (2, "z.png", '{"gt_parse": {}}')]
    df = spark.createDataFrame(rows,
                               "sample_id int, image_ref string, ground_truth string")
    out = {r["sample_id"]: r["fields"] for r in L.load_checkbox(df).collect()}
    assert all(len(f) == 0 for f in out.values())

"""Benchmark dataset loaders, Spark-first.

The reference ships one imperative converter per dataset
(/root/reference/docext/benchmark/vlm_datasets/*.py, ~1200 LoC): each pulls
a HuggingFace/local dataset, walks it row by row, and emits BenchmarkData
records (ds.py:74-83). Here every loader is a declarative DataFrame
transform raw → the common benchmark schema — the per-dataset semantics
(key remaps, bbox denormalization, multi-value folding, class-wise
sampling) run as native Catalyst expressions over however many billion rows
the raw table has, instead of a tqdm loop on one machine.

This sandbox has no HuggingFace access and no image codecs, so each loader
is paired with a deterministic synthetic RAW fixture (synth_raw) shaped
like the real dataset's schema; the loader transforms are the real,
tested artifact. Image payloads stay opaque references (image_refs) — at
scale they are binary columns decoded by the multimodal mapInPandas ops.

BENCHMARK_SCHEMA (the Spark analog of ds.py BenchmarkData):
    ds_name, task, sample_id, extraction_type, image_refs,
    fields: array<struct<label, values, bbox, page>>,
    question, answers, doc_type, class_labels, ocr_text, table_json
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

FIELD_STRUCT = ("array<struct<label:string,values:array<string>,"
                "bbox:array<int>,page:int>>")

_BENCH_COLS = ["ds_name", "task", "sample_id", "extraction_type",
               "image_refs", "fields", "question", "answers", "doc_type",
               "class_labels", "ocr_text", "table_json"]


def _bench_frame(df: DataFrame, ds_name: str, task: str,
                 extraction_type: str, **cols) -> DataFrame:
    """Project onto the common benchmark schema, nulling absent columns."""
    out = (df.withColumn("ds_name", F.lit(ds_name))
             .withColumn("task", F.lit(task))
             .withColumn("extraction_type", F.lit(extraction_type)))
    defaults = {
        "image_refs": F.lit(None).cast("array<string>"),
        "fields": F.lit(None).cast(FIELD_STRUCT),
        "question": F.lit(None).cast("string"),
        "answers": F.lit(None).cast("array<string>"),
        "doc_type": F.lit(None).cast("string"),
        "class_labels": F.lit(None).cast("array<string>"),
        "ocr_text": F.lit(None).cast("string"),
        "table_json": F.lit(None).cast("string"),
    }
    for name, default in defaults.items():
        out = out.withColumn(name, cols[name] if name in cols else default)
    return out.select(*_BENCH_COLS)


# ---------------------------------------------------------------------------
# docile — KIE with relative bboxes and multi-value labels
# ---------------------------------------------------------------------------

def load_docile(raw: DataFrame) -> DataFrame:
    """raw: (doc_id, page, fieldtype, text, bbox array<double> RELATIVE
    [l, t, r, b], page_w, page_h, image_refs).

    Mirrors docile.py:86-121: bbox denormalized by the page size at 200dpi
    then int-cast (:90-102), repeated fieldtypes fold into a value LIST
    keeping the first occurrence's bbox/page (:108-119), one benchmark row
    per document with extraction_type=FIELD (:120-126)."""
    denormed = raw.select(
        "doc_id", "image_refs", "page", "fieldtype", "text",
        F.array(
            (F.element_at("bbox", 1) * F.col("page_w")).cast("int"),
            (F.element_at("bbox", 2) * F.col("page_h")).cast("int"),
            (F.element_at("bbox", 3) * F.col("page_w")).cast("int"),
            (F.element_at("bbox", 4) * F.col("page_h")).cast("int"),
        ).alias("bbox_abs"),
        F.col("seq").alias("seq"))
    w = Window.partitionBy("doc_id", "fieldtype").orderBy("seq")
    folded = (denormed
              .withColumn("rn", F.row_number().over(w))
              .groupBy("doc_id", "fieldtype")
              .agg(F.first("image_refs").alias("image_refs"),
                   # values in annotation order; bbox/page from the FIRST
                   # occurrence (the reference mutates the first Field)
                   F.array_sort(F.collect_list(F.struct("rn", "text")))
                    .alias("vs"),
                   F.min_by("bbox_abs", "rn").alias("bbox"),
                   F.min_by("page", "rn").alias("page"),
                   # first-occurrence position of this fieldtype within the
                   # document — the cross-field ordering key
                   F.min("seq").alias("first_rn")))
    # fields in FIRST-OCCURRENCE order (the reference's dict insertion
    # order, docile.py:108-119): collect_list alone is partition-order
    # dependent — sort by each field's first annotation index, then strip
    # the key, so downstream prompts are deterministic
    fields = (folded.groupBy("doc_id")
              .agg(F.first("image_refs").alias("image_refs"),
                   F.transform(
                       F.array_sort(F.collect_list(F.struct(
                           F.col("first_rn").alias("ord"),
                           F.struct(
                               F.col("fieldtype").alias("label"),
                               F.transform("vs", lambda s: s["text"])
                                .alias("values"),
                               F.col("bbox"), F.col("page")).alias("f")))),
                       lambda s: s["f"]).alias("fields"))
              .withColumnRenamed("doc_id", "sample_id"))
    return _bench_frame(fields, "docile", "KIE", "field",
                        image_refs=F.col("image_refs"),
                        fields=F.col("fields"))


# ---------------------------------------------------------------------------
# nanonets_kie — flat annotation map → fields
# ---------------------------------------------------------------------------

def load_nanonets_kie(raw: DataFrame) -> DataFrame:
    """raw: (sample_id, image_ref, annotations map<string,string>).
    nanonets_kie.py:60-73: one Field per annotation entry."""
    out = raw.select(
        "sample_id", F.array("image_ref").alias("image_refs"),
        F.transform(
            F.array_sort(F.map_entries("annotations")),
            lambda e: F.struct(e["key"].alias("label"),
                               F.array(e["value"]).alias("values"),
                               F.lit(None).cast("array<int>").alias("bbox"),
                               F.lit(None).cast("int").alias("page")))
        .alias("fields"))
    return _bench_frame(out, "nanonets_kie", "KIE", "field",
                        image_refs=F.col("image_refs"),
                        fields=F.col("fields"))


# ---------------------------------------------------------------------------
# nanonets_cls — classification with class-wise sampling
# ---------------------------------------------------------------------------

def load_nanonets_cls(raw: DataFrame,
                      max_samples: int | None = None) -> DataFrame:
    """raw: (sample_id, image_refs array<string>, label).

    nanonets_cls.py:40-55: class_labels = sorted distinct labels over the
    WHOLE split; class-wise cap keeps the max_samples lowest sample ids per
    class (sorted_class_ids[:max_samples]) — here a rank window per label,
    which is the shuffle-once formulation of the same rule."""
    labels = (raw.select("label").distinct()
              .agg(F.array_sort(F.collect_list("label")).alias("ls")))
    capped = raw
    if max_samples is not None and max_samples > 0:
        w = Window.partitionBy("label").orderBy("sample_id")
        capped = (raw.withColumn("rn", F.row_number().over(w))
                     .filter(F.col("rn") <= max_samples).drop("rn"))
    out = capped.join(F.broadcast(labels))
    return _bench_frame(out, "nanonets_cls", "CLASSIFICATION",
                        "classification",
                        image_refs=F.col("image_refs"),
                        doc_type=F.col("label"),
                        class_labels=F.col("ls"))


# ---------------------------------------------------------------------------
# chartqa / docvqa — VQA
# ---------------------------------------------------------------------------

def load_chartqa(raw: DataFrame) -> DataFrame:
    """raw: (sample_id, image_ref, query, label array<string>).
    chartqa.py:56-72: answer = label[0] (single-label dataset)."""
    out = raw.select("sample_id",
                     F.array("image_ref").alias("image_refs"),
                     F.col("query").alias("question"),
                     F.array(F.element_at("label", 1)).alias("answers"))
    return _bench_frame(out, "chartqa", "VQA", "vqa",
                        image_refs=F.col("image_refs"),
                        question=F.col("question"),
                        answers=F.col("answers"))


def load_docvqa(raw: DataFrame) -> DataFrame:
    """raw: (sample_id, image_ref, question, answers array<string>).
    docvqa.py:52-73: the FULL multi-answer list is kept (best-of scoring
    downstream, metrics A3)."""
    out = raw.select("sample_id", F.array("image_ref").alias("image_refs"),
                     "question", "answers")
    return _bench_frame(out, "docvqa", "VQA", "vqa",
                        image_refs=F.col("image_refs"),
                        question=F.col("question"),
                        answers=F.col("answers"))


# ---------------------------------------------------------------------------
# handwritten_forms (checkbox) — nested ground-truth remap
# ---------------------------------------------------------------------------

# (gt_parse section, source key) → benchmark label; None = skip.
# checkbox.py:48-81 _get_kie_data, including the deliberately skipped
# noisy annotations (person.death, person_data.birth_day).
CHECKBOX_KEY_MAP: dict[tuple[str, str], str | None] = {
    ("person", "death"): None,
    ("person", "State file #"): "State file #",
    ("person", "county"): "place_of_death_county",
    ("person", "city"): "place_of_death_city",
    ("person", "name"): "name_of_deceased",
    ("person_data", "Gender"): "deceased_gender",
    ("person_data", "Race"): "deceased_race",
    ("person_data", "status"): "deceased_status",
    ("person_data", "birth_day"): None,
    ("person_data", "Age"): "deceased_age",
    ("person_data", "birth_place"): "birth_place",
    ("relation", "Father"): "father_name",
    ("relation", "Mother"): "mother_name",
}


_GT_SCHEMA = ("struct<gt_parse:struct<person:map<string,string>,"
              "person_data:map<string,string>,relation:map<string,string>>>")


def checkbox_fields_expr(gt_col: str = "ground_truth"):
    """fields array from the raw ground_truth JSON, applying
    CHECKBOX_KEY_MAP entirely in the plan (one from_json, then map lookups
    per mapped key — no UDF; try_element_at so absent keys are skipped,
    not ANSI errors)."""
    gt = F.from_json(F.col(gt_col), _GT_SCHEMA)["gt_parse"]
    parts = []
    for (section, key), label in CHECKBOX_KEY_MAP.items():
        if label is None:
            continue
        val = F.try_element_at(gt[section], F.lit(key))
        parts.append(F.when(val.isNotNull(), F.struct(
            F.lit(label).alias("label"),
            F.array(val).alias("values"),
            F.lit(None).cast("array<int>").alias("bbox"),
            F.lit(None).cast("int").alias("page"))))
    return F.filter(F.array(*parts), lambda s: s.isNotNull())


def load_checkbox(raw: DataFrame) -> DataFrame:
    """raw: (sample_id, image_ref, ground_truth json-string)."""
    out = raw.select("sample_id", F.array("image_ref").alias("image_refs"),
                     checkbox_fields_expr().alias("fields"))
    return _bench_frame(out, "handwritten_forms", "KIE", "field",
                        image_refs=F.col("image_refs"),
                        fields=F.col("fields"))


# ---------------------------------------------------------------------------
# nanonets_longdocbench — KIE turned into long-context VQA with distractors
# ---------------------------------------------------------------------------

def load_longdocbench(raw_test: DataFrame, raw_train: DataFrame,
                      additional_docs_count: int = 20) -> DataFrame:
    """longdocbench.py:109-155: each test form becomes VQA rows asking for
    ONE field, with the page hidden inside `additional_docs_count`
    distractor pages from the train split, inserted at 30% and 60% of the
    sequence (insertion_points [30, 60] → 2 rows per sample).

    Determinism: the reference uses random.seed(i); here field2ask is the
    xxhash64-min field label and distractors are the hash-ordered first
    `additional_docs_count` train pages — same semantics (seeded pseudo-
    random, reproducible), engine-native."""
    distractors = (raw_train
                   .withColumn("h", F.xxhash64("image_ref"))
                   .orderBy("h").limit(additional_docs_count)
                   .agg(F.array_sort(
                       F.collect_list(F.struct("h", "image_ref"))).alias("ps"))
                   .select(F.transform("ps", lambda s: s["image_ref"])
                            .alias("pool")))
    fields = (raw_test.select(
        "sample_id", "image_ref", checkbox_fields_expr().alias("fields")))
    picked = fields.select(
        "sample_id", "image_ref", "fields",
        F.element_at(
            F.array_sort(
                F.transform("fields",
                            lambda f: F.struct(
                                F.xxhash64(F.col("sample_id"), f["label"])
                                 .alias("h"),
                                f.alias("f")))), 1)["f"].alias("ask"))
    ctx = picked.select(
        "sample_id", "image_ref",
        F.col("ask.label").alias("field2ask"),
        F.element_at("ask.values", 1).alias("answer"),
        F.to_json(F.filter("fields",
                           lambda f: f["label"] != F.col("ask.label")))
         .alias("other_fields"))
    pts = F.explode(F.array(F.lit(30), F.lit(60))).alias("pos")
    rows = (ctx.join(F.broadcast(distractors))
            .select("*", pts)
            .withColumn("insert_idx",
                        (F.size("pool") * F.col("pos") / 100).cast("int"))
            .withColumn("image_refs",
                        F.concat(F.slice("pool", 1, F.col("insert_idx")),
                                 F.array("image_ref"),
                                 F.slice(F.col("pool"),
                                         F.col("insert_idx") + 1,
                                         F.size("pool"))))
            .withColumn("question",
                        F.concat(F.lit("Extract "), F.col("field2ask"),
                                 F.lit(" from the image which has the "
                                       "following information: "),
                                 F.col("other_fields"),
                                 F.lit(". Just return the answer. Do not "
                                       "include any other text.")))
            .withColumn("answers", F.array("answer"))
            .withColumn("sample_id",
                        F.col("sample_id") * 100 + F.col("pos")))
    return _bench_frame(rows, "nanonets_longdocbench", "VQA", "vqa",
                        image_refs=F.col("image_refs"),
                        question=F.col("question"),
                        answers=F.col("answers"))


# ---------------------------------------------------------------------------
# OCR family — handwriting / rotated / diacritics
# ---------------------------------------------------------------------------

def load_ocr(raw: DataFrame, ds_name: str = "ocr_handwriting",
             rotation: bool = False) -> DataFrame:
    """raw: (sample_id, image_ref, text). ocr_hw.py:44-74: ocr_text
    passthrough; rotation (ocr_handwriting_rotated) perturbs the IMAGE
    payload only — at scale that is a multimodal mapInPandas decode-rotate
    (operators/multimodal.py), so here the rotated variant carries the
    deterministic per-sample angle the reference draws (random.seed(i),
    choice(range(-5,5)), ocr_hw.py:58-60) in the image ref."""
    out = raw.select("sample_id", F.col("text").alias("ocr_text"),
                     F.col("image_ref").alias("ref0"))
    if rotation:
        angle = (F.pmod(F.xxhash64("sample_id"), F.lit(10)) - 5).cast("int")
        out = out.withColumn(
            "ref0", F.concat("ref0", F.lit("#rot="), angle.cast("string")))
    out = out.withColumn("image_refs", F.array("ref0")).drop("ref0")
    return _bench_frame(out, ds_name, "OCR", "ocr",
                        image_refs=F.col("image_refs"),
                        ocr_text=F.col("ocr_text"))


def load_ocr_handwriting(raw: DataFrame) -> DataFrame:
    return load_ocr(raw, "ocr_handwriting", rotation=False)


def load_ocr_handwriting_rotated(raw: DataFrame) -> DataFrame:
    return load_ocr(raw, "ocr_handwriting_rotated", rotation=True)


def load_ocr_diacritics(raw: DataFrame) -> DataFrame:
    """ocr_dia.py:16-34: same pipeline as handwriting, different source."""
    return load_ocr(raw, "digital_ocr_diacritics", rotation=False)


# ---------------------------------------------------------------------------
# nanonets_tablebench — 6 size/density variants share one transform
# ---------------------------------------------------------------------------

TABLEBENCH_VARIANTS = [
    "nanonets_small_dense_structured_table",
    "nanonets_small_sparse_structured_table",
    "nanonets_small_sparse_unstructured_table",
    "nanonets_long_dense_structured_table",
    "nanonets_long_sparse_structured_table",
    "nanonets_long_sparse_unstructured_table",
]


def load_tablebench(raw: DataFrame, ds_name: str) -> DataFrame:
    """raw: (sample_id, image_ref, annotation json-records-string).
    nanonets_tablebench.py:34-72: the annotation is a records-oriented
    JSON table; it stays canonical JSON here (table_json) and feeds the
    GRITS scorer via core.tables — pandas round-trip is a driver-side
    convenience the plan does not need."""
    if ds_name not in TABLEBENCH_VARIANTS:
        raise ValueError(f"unknown tablebench variant: {ds_name}")
    out = raw.select("sample_id", F.array("image_ref").alias("image_refs"),
                     F.col("annotation").alias("table_json"))
    return _bench_frame(out, ds_name, "TABLE", "table",
                        image_refs=F.col("image_refs"),
                        table_json=F.col("table_json"))


# ---------------------------------------------------------------------------
# registry + synthetic raw fixtures
# ---------------------------------------------------------------------------

def synth_raw(spark: SparkSession, name: str, n: int = 20) -> DataFrame:
    """Deterministic raw-table fixture shaped like each real dataset's
    schema (this sandbox has no HuggingFace access; at deployment the raw
    table is the HF parquet export read with spark.read.parquet).

    Built via pandas → Arrow, NOT createDataFrame(list): list-backed local
    relations evaluate through a Python worker per partition (~0.5s per
    action here), Arrow-backed ones are JVM-local (~0.01s) — 40x on a
    16-loader union (measured)."""
    import pandas as pd
    rows, schema = _synth_rows(name, n)
    # fields are ", "-separated; nested type commas carry no space
    cols = [f.split(":")[0].strip() for f in schema.split(", ")]
    pdf = pd.DataFrame(rows, columns=cols)
    return spark.createDataFrame(pdf, schema.replace(":", " ")).coalesce(1)


def _synth_rows(name: str, n: int) -> tuple[list, str]:
    r = range(n)
    if name == "docile":
        rows = []
        for i in r:
            # seq = DOCUMENT-GLOBAL annotation index (the loader's
            # first-occurrence ordering key). Odd docs list 'total' before
            # 'invoice_no' so insertion order ≠ alphabetical — pins that
            # the loader preserves annotation order, not label order.
            fts = (["invoice_no", "total", "total"] if i % 2 == 0
                   else ["total", "total", "invoice_no"])
            for seq, ft in enumerate(fts):
                rows.append((i, 0, ft, f"{ft}-{i}-{seq}",
                             [0.1, 0.2, 0.5, 0.4], 1700.0, 2200.0,
                             [f"pdf_{i}_p0.jpeg"], seq))
        return rows, ("doc_id:int, page:int, fieldtype:string, text:string, "
                      "bbox:array<double>, page_w:double, page_h:double, "
                      "image_refs:array<string>, seq:int")
    if name == "nanonets_kie":
        return ([(i, f"img_{i}.png",
                  {"seller_name": f"Seller {i}", "total_amount": str(100 + i)})
                 for i in r],
                "sample_id:int, image_ref:string, "
                "annotations:map<string,string>")
    if name == "nanonets_cls":
        labels = ["invoice", "receipt", "form"]
        return ([(i, [f"img_{i}.png"], labels[i % 3]) for i in r],
                "sample_id:int, image_refs:array<string>, label:string")
    if name == "chartqa":
        return ([(i, f"chart_{i}.png", f"What is value {i}?", [str(i * 10)])
                 for i in r],
                "sample_id:int, image_ref:string, query:string, "
                "label:array<string>")
    if name == "docvqa":
        return ([(i, f"doc_{i}.png", f"Question {i}?", [f"a{i}", f"A {i}"])
                 for i in r],
                "sample_id:int, image_ref:string, question:string, "
                "answers:array<string>")
    if name in ("handwritten_forms", "longdocbench_test", "longdocbench_train"):
        import json as _json
        rows = [(i, f"form_{name}_{i}.png", _json.dumps({"gt_parse": {
            "person": {"name": f"Person {i}", "county": f"County {i}",
                       "death": "1950"},
            "person_data": {"Gender": "F" if i % 2 else "M",
                            "Age": str(30 + i), "birth_day": "x"},
            "relation": {"Father": f"Father {i}"}}}))
            for i in r]
        return rows, "sample_id:int, image_ref:string, ground_truth:string"
    if name.startswith("ocr"):
        return ([(i, f"{name}_{i}.png", f"line {i} of handwritten text")
                 for i in r],
                "sample_id:int, image_ref:string, text:string")
    if name in TABLEBENCH_VARIANTS:
        import json as _json
        return ([(i, f"table_{i}.png",
                  _json.dumps([{"col_a": f"a{i}", "col_b": f"b{i}"},
                               {"col_a": f"a{i}x", "col_b": f"b{i}y"}]))
                 for i in r],
                "sample_id:int, image_ref:string, annotation:string")
    raise ValueError(f"no synthetic fixture for {name}")


def load_all(spark: SparkSession, n_per_ds: int = 20) -> DataFrame:
    """Every loader over its fixture, unioned by name (A12) — the full
    benchmark corpus as one frame with a stable schema."""
    frames = [
        load_docile(synth_raw(spark, "docile", n_per_ds)),
        load_nanonets_kie(synth_raw(spark, "nanonets_kie", n_per_ds)),
        load_nanonets_cls(synth_raw(spark, "nanonets_cls", n_per_ds),
                          max_samples=5),
        load_chartqa(synth_raw(spark, "chartqa", n_per_ds)),
        load_docvqa(synth_raw(spark, "docvqa", n_per_ds)),
        load_checkbox(synth_raw(spark, "handwritten_forms", n_per_ds)),
        load_longdocbench(synth_raw(spark, "longdocbench_test", n_per_ds),
                          synth_raw(spark, "longdocbench_train", 40)),
        load_ocr_handwriting(synth_raw(spark, "ocr_hw", n_per_ds)),
        load_ocr_handwriting_rotated(synth_raw(spark, "ocr_hw_rot", n_per_ds)),
        load_ocr_diacritics(synth_raw(spark, "ocr_dia", n_per_ds)),
    ]
    frames += [load_tablebench(synth_raw(spark, v, n_per_ds), v)
               for v in TABLEBENCH_VARIANTS]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out

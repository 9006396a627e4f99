"""Per-task chat-message assembly vs a pure-Python mirror of the reference
builders (tasks.py:107-282 + configs/benchmark.yaml default templates).
Equality is at the parsed-JSON level (whitespace-insensitive)."""
from __future__ import annotations

import json

from docext_spark.operators.messages import TEMPLATES, benchmark_messages
from docext_spark.sources import loaders as L


def _url(ref: str) -> str:
    return f"data:image/png;base64,<unresolved:{ref}>"


def _expected(task: str, image_refs, *, fields=None, labels=None,
              question=None, columns=None) -> list:
    t = TEMPLATES[task]
    if task == "KIE":
        user = ("Extract the following {fields} from the above document. "
                "If a field is not present, return ''. Return the output "
                "in a valid JSON format as {output_format}.").format(
            fields=fields, output_format={f: ".." for f in fields})
        system = t["system_prompt"]
    elif task == "CLASSIFICATION":
        system = t["system_prompt"].format(labels=labels)
        user = t["user_prompt"].format(labels=labels)
    elif task == "VQA":
        system = t["system_prompt"]
        user = t["user_prompt"].format(question=question)
    elif task == "TABLE":
        system = t["system_prompt"]
        user = t["user_prompt"].format(
            columns=columns, output_format=[{c: "" for c in columns}])
    else:
        system, user = t["system_prompt"], t["user_prompt"]
    pages = []
    for i, ref in enumerate(image_refs):
        content = [] if task == "OCR" else [
            {"type": "text", "text": f"Page {i + 1}"}]
        content.append({"type": "image_url", "image_url": {"url": _url(ref)}})
        pages.append({"role": "user", "content": content})
    return ([{"role": "system", "content": system}] + pages
            + [{"role": "user", "content": user}])


def test_messages_match_reference_builders(spark):
    bench = L.load_all(spark, n_per_ds=3)
    out = {(r["ds_name"], r["sample_id"]): json.loads(r["messages"])
           for r in benchmark_messages(bench).collect()}

    got = out[("nanonets_kie", 0)]
    assert got == _expected("KIE", ["img_0.png"],
                            fields=["seller_name", "total_amount"])

    got = out[("nanonets_cls", 0)]
    assert got == _expected("CLASSIFICATION", ["img_0.png"],
                            labels=["form", "invoice", "receipt"])

    got = out[("chartqa", 1)]
    assert got == _expected("VQA", ["chart_1.png"],
                            question="What is value 1?")

    got = out[("ocr_handwriting", 2)]
    assert got == _expected("OCR", ["ocr_hw_2.png"])
    # OCR page message carries ONLY the image item (tasks.py:222-234)
    assert len(got[1]["content"]) == 1

    name = L.TABLEBENCH_VARIANTS[0]
    got = out[(name, 0)]
    assert got == _expected("TABLE", ["table_0.png"],
                            columns=["col_a", "col_b"])

    # multi-page: docile rows carry one page message per image ref with
    # 1-based page separators (tasks.py:120-136)
    got = out[("docile", 0)]
    assert got[1]["content"][0] == {"type": "text", "text": "Page 1"}
    assert got[0]["role"] == "system" and got[-1]["role"] == "user"


def test_messages_cover_every_loader_row(spark):
    bench = L.load_all(spark, n_per_ds=3)
    msgs = benchmark_messages(bench)
    assert msgs.count() == bench.count()
    assert msgs.filter("messages IS NULL").count() == 0


def test_messages_empty_or_null_image_refs_valid_json(spark):
    """Rows with no resolvable media must still yield VALID JSON (system +
    final user message, no dangling separator) — not '[{...}, , {...}]' or
    NULL."""
    from pyspark.sql import functions as F
    bench = (L.load_all(spark, n_per_ds=2)
             .filter("ds_name = 'docvqa'")
             .withColumn("image_refs",
                         F.when(F.col("sample_id") == 0,
                                F.array().cast("array<string>"))))
    out = {r["sample_id"]: r["messages"]
           for r in benchmark_messages(bench).collect()}
    for sid, raw in out.items():
        msgs = json.loads(raw)            # must parse
        assert [m["role"] for m in msgs] == ["system", "user"]


def test_templates_are_the_source_of_truth(spark):
    """Editing a TEMPLATES prompt must change the emitted messages (the
    expressions are derived from the templates, not re-typed copies)."""
    orig = TEMPLATES["VQA"]["user_prompt"]
    try:
        TEMPLATES["VQA"]["user_prompt"] = "Q: {question} -- answer tersely."
        bench = L.load_all(spark, n_per_ds=1).filter("ds_name = 'docvqa'")
        out = json.loads(
            benchmark_messages(bench).collect()[0]["messages"])
        assert out[-1]["content"] == "Q: Question 0? -- answer tersely."
    finally:
        TEMPLATES["VQA"]["user_prompt"] = orig

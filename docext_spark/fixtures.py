"""Deterministic benchmark fixtures (FIXTURES.md §3-§5, seed=42).

Miniature versions of the 5 IDP tasks with planted ground truth, including
the reference's metric edge cases: both-empty → 1.0 (kie.py:28-29), missing
label → "" (extract.py:89), multi-answer best-of (vqa.py:36-58), perturbed
tables for GRITS goldens.
"""
from __future__ import annotations

import json
import random

_CITIES = ["Berlin", "Lyon", "Osaka", "Quito", "Tunis", "Perth"]
_NAMES = ["ACME Corp", "Globex", "Initech", "Umbrella", "Stark Ltd"]


def generate_fixtures(n_per_task: int = 40, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows: list[dict] = []

    def base(i, task):
        return {"doc_id": f"{task.lower()}_{i:04d}", "task": task,
                "text": "", "gt": "", "gt_answers": [], "labels": [],
                "gt_html": "", "pred_html": ""}

    for i in range(n_per_task):  # KIE
        r = base(i, "KIE")
        num = f"INV-{rng.randint(1000, 9999)}"
        buyer = rng.choice(_NAMES)
        amount = f"{rng.randint(10, 9000)}.{rng.randint(0, 99):02d}"
        r["text"] = (f"invoice_number: {num}\nbuyer_name: {buyer}\n"
                     f"invoice_amount: {amount}\nnote: {rng.choice(_CITIES)}")
        gt = [{"label": "invoice_number", "value": num},
              {"label": "buyer_name", "value": buyer},
              {"label": "invoice_amount", "value": amount}]
        if i % 5 == 0:  # a gt label the doc doesn't carry → pred "" expected
            gt.append({"label": "seller_tax_id", "value": ""})
        r["gt"] = json.dumps(gt)
        rows.append(r)

    for i in range(n_per_task):  # OCR — markdown conversion vs expected
        r = base(i, "OCR")
        words = " ".join(rng.choice(_CITIES).lower() for _ in range(10))
        r["text"] = f"<h1>Receipt</h1><p>{words}</p>"
        r["gt"] = f"# Receipt\n\n{words}"
        rows.append(r)

    for i in range(n_per_task):  # VQA — multi-answer best-of
        r = base(i, "VQA")
        city = rng.choice(_CITIES)
        r["text"] = f"answer: {city}"
        r["gt_answers"] = [city.upper(), city, f"City of {city}"]
        rows.append(r)

    for i in range(n_per_task):  # CLASSIFICATION — exact match
        r = base(i, "CLASSIFICATION")
        label = ["invoice", "receipt", "passport", "report"][i % 4]
        r["text"] = f"this {label} document mentions the {label} terms"
        r["gt"] = label
        rows.append(r)

    for i in range(n_per_task):  # TABLE — GRITS with perturbations
        r = base(i, "TABLE")
        cells = [[rng.choice(_CITIES) for _ in range(3)] for _ in range(3)]
        def html(grid):
            return "<table>" + "".join(
                "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
                for row in grid) + "</table>"
        r["gt_html"] = html(cells)
        pert = [row[:] for row in cells]
        mode = i % 4
        if mode == 1:    # cell edit
            pert[1][1] = pert[1][1][:-1] + "x"
        elif mode == 2:  # missing row
            pert = pert[:2]
        elif mode == 3:  # swapped columns
            pert = [[row[1], row[0], row[2]] for row in pert]
        r["pred_html"] = html(pert)
        rows.append(r)

    rng.shuffle(rows)
    return rows


def fixtures_df(spark, n_per_task: int = 40, seed: int = 42):
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("task", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("gt", T.StringType(), False),
        T.StructField("gt_answers", T.ArrayType(T.StringType()), False),
        T.StructField("labels", T.ArrayType(T.StringType()), False),
        T.StructField("gt_html", T.StringType(), False),
        T.StructField("pred_html", T.StringType(), False),
    ])
    return spark.createDataFrame(generate_fixtures(n_per_task, seed), schema)

"""X4/X6 — key-information (field) extraction + confidence, native heuristics.

The reference delegates perception to a VLM and post-processes its JSON
(/root/reference/docext/core/extract.py:22-98, prompts.py:22-52); the output
contract is: for every requested field name, a string value ("" when absent,
extract.py:89) plus a binary High/Low confidence (confidence.py:4-17,
defaulted "Low" at extract.py:90). We implement the perception natively:
label:value pattern matching over the turn text.

Field-name normalization mirrors prompts.py:9-19
(``field.replace(' ', '_').lower()``).

Pure Python, deterministic, no Spark imports.
"""
from __future__ import annotations

import re


def normalize_field_name(name: str) -> str:
    return name.replace(" ", "_").lower()


def _label_pattern(name: str) -> re.Pattern:
    # label tokens may be joined by space/underscore/dash in the document
    tokens = [re.escape(t) for t in normalize_field_name(name).split("_") if t]
    label = r"[\s_\-]*".join(tokens)
    return re.compile(rf"(?im)^\W*{label}\s*[:=→]\s*(.+?)\s*$")


def extract_fields(text: str, field_names: list[str]) -> list[dict]:
    """Extract each requested field from the text.

    Returns one dict per field (in request order — extract.py:85-94 builds
    the frame in field_names order): {field, answer, answers, confidence}.

    - missing field → answer "" (extract.py:89), confidence "Low"
      (extract.py:90)
    - repeated label → all values kept in ``answers`` (multi-value fold,
      vlm_datasets/docile.py:107-118); ``answer`` is the first match
    - confidence: "High" iff exactly one unambiguous match, else "Low"
      (binary contract, confidence.py:4-17)
    """
    out = []
    for name in field_names:
        values = [m.group(1).strip() for m in _label_pattern(name).finditer(text or "")]
        values = [v for v in values if v]
        out.append({
            "field": name,
            "answer": values[0] if values else "",
            "answers": values,
            "confidence": "High" if len(values) == 1 else "Low",
        })
    return out


def numeric_confidence(answers: list[str]) -> int:
    """0-100 numeric confidence (reference confidence.py:20-33 contract):
    100 = one unambiguous match, 50 = ambiguous (multiple matches),
    0 = no match."""
    if len(answers) == 1:
        return 100
    return 50 if answers else 0

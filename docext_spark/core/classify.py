"""X7 — document/payload classification into a closed label vocabulary.

Reference contract (/root/reference/docext/benchmark/tasks.py:146-177,
metrics/classification.py:6-26): prediction is exactly one label string from
the vocabulary, scored by exact match. Native method: keyword-occurrence
scoring per label; argmax with deterministic tie-break (vocabulary order).

Pure Python, deterministic, no Spark imports.
"""
from __future__ import annotations

import re


def classify(text: str, labels: list[str]) -> str:
    """Return the best label; "" for an empty vocabulary."""
    if not labels:
        return ""
    low = (text or "").lower()
    words = re.findall(r"[a-z0-9]+", low)
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    best_label, best_score = labels[0], -1
    for label in labels:
        tokens = re.findall(r"[a-z0-9]+", label.lower())
        score = sum(counts.get(t, 0) for t in tokens)
        if score > best_score:
            best_label, best_score = label, score
    return best_label

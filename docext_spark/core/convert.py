"""The per-turn conversion kernel: payload kind detection + markdown emission.

This is the function the flagship pipeline applies to every turn's ``text``
(the analog of the reference's per-page VLM markdown conversion,
/root/reference/docext/core/pdf2md/pdf2md.py:74-166, reimplemented natively
per the north rule). It is the single shared implementation for the Spark
pUDF and the pytest oracle — byte equality by construction.

Payload kinds (FIXTURES.md §1 mix):
  html | pdf_text | md_table | json_payload | plain
"""
from __future__ import annotations

import re

from docext_spark.core.html2md import html_to_markdown
from docext_spark.core.jsonrepair import json_payload_to_markdown
from docext_spark.core.pdflayout import looks_like_pdf_blocks, pdf_blocks_to_markdown
from docext_spark.core.tables import pipe_table_to_html, slice_pipe_region

_HTML_TAG_RE = re.compile(
    r"(?is)<(?:!doctype|html|head|body|div|p|nav|table|t[rdh]|h[1-6]|ul|ol|li|"
    r"script|style|footer|header|aside|section|article|main|blockquote|pre|"
    r"span|a|br|img|input|form|b|i|em|strong)\b")
_MD_TABLE_SEP_RE = re.compile(r"(?m)^\s*\|?\s*:?-{3,}:?\s*(\|\s*:?-{3,}:?\s*)+\|?\s*$")


def detect_payload_kind(text: str) -> str:
    if text is None:
        return "plain"
    s = text.strip()
    if not s:
        return "plain"
    if s[0] in "{[":
        return "json_payload"
    if looks_like_pdf_blocks(s):
        return "pdf_text"
    if _HTML_TAG_RE.search(s):
        return "html"
    if _MD_TABLE_SEP_RE.search(s):
        return "md_table"
    return "plain"


def _md_table_payload_to_markdown(text: str) -> str:
    """Prose kept as-is; the pipe-table region (first '|' .. last '|',
    extract.py:118 slice semantics) re-emitted as HTML."""
    region = slice_pipe_region(text)
    html = pipe_table_to_html(text)
    if region is None or html is None:
        return text.strip()
    start = text.index("|")
    end = text.rindex("|") + 1
    before = text[:start].strip()
    after = text[end:].strip()
    parts = [p for p in (before, html, after) if p]
    return "\n\n".join(parts)


def turn_to_markdown(text: str) -> dict:
    """Convert one turn payload to markdown.

    Returns a flat dict (stable key order = output schema):
      md, kind, blocks_kept, blocks_dropped, classifier_decisions,
      spans (list of (label, start, end)), parse_ok
    """
    kind = detect_payload_kind(text)
    if kind == "html":
        r = html_to_markdown(text)
        return {"md": r["md"], "kind": kind,
                "blocks_kept": r["blocks_kept"],
                "blocks_dropped": r["blocks_dropped"],
                "classifier_decisions": r["classifier_decisions"],
                "spans": r["spans"], "parse_ok": True}
    if kind == "pdf_text":
        r = pdf_blocks_to_markdown(text)
        return {"md": r["md"], "kind": kind,
                "blocks_kept": r["n_blocks"], "blocks_dropped": 0,
                "classifier_decisions": r["n_blocks"],
                "spans": [("pdf", 0, len(text))] if r["n_blocks"] else [],
                "parse_ok": True}
    if kind == "json_payload":
        r = json_payload_to_markdown(text)
        return {"md": r["md"], "kind": kind,
                "blocks_kept": 1, "blocks_dropped": 0,
                "classifier_decisions": 1,
                "spans": [("json", 0, len(text))],
                "parse_ok": r["ok"]}
    if kind == "md_table":
        md = _md_table_payload_to_markdown(text)
        return {"md": md, "kind": kind,
                "blocks_kept": 1, "blocks_dropped": 0,
                "classifier_decisions": 1,
                "spans": [("md_table", 0, len(text))],
                "parse_ok": True}
    md = (text or "").strip()
    return {"md": md, "kind": "plain",
            "blocks_kept": 1 if md else 0,
            "blocks_dropped": 0 if md else 1,
            "classifier_decisions": 1,
            "spans": [("p", 0, len(text))] if md else [],
            "parse_ok": True}


def conversation_markdown(turn_mds: list[str]) -> str:
    """Reassemble per-turn markdown into conversation-level markdown with
    per-turn headers, mirroring the reference's per-page concatenation
    format ``Page {i+1} of {N}\\n`` (pdf2md.py:126-135)."""
    n = len(turn_mds)
    return "\n".join(f"Page {i + 1} of {n}\n{md}" for i, md in enumerate(turn_mds))

"""JSON repair — the subset of json_repair behavior the reference relies on.

Reference usage: /root/reference/docext/benchmark/benchmark.py:618-656 and
core/extract.py:66-67 — model output is repaired (trailing commas, single
quotes, code fences), parsed, and list-of-dicts responses are merged with
duplicate keys accumulating into lists (benchmark.py:638-652).

We replicate exactly that subset (documented per SURVEY.md §7.4 risk #4):
  * strip ``` fences
  * single-quoted strings → double-quoted
  * unquoted object keys → quoted
  * trailing commas before } / ] removed
  * list-of-dicts → merged dict, dup keys append into a list

Pure Python, deterministic, no Spark imports.
"""
from __future__ import annotations

import json
import re

_FENCE_RE = re.compile(r"^\s*```(?:json)?\s*|\s*```\s*$")
_TRAILING_COMMA_RE = re.compile(r",(\s*[}\]])")
_UNQUOTED_KEY_RE = re.compile(r"([{,]\s*)([A-Za-z_][A-Za-z0-9_\- ]*?)(\s*:)")


def _requote_single_quoted(s: str) -> str:
    """Convert single-quoted strings to double-quoted, CONTEXT-AWARE: a
    linear scan that skips over double-quoted strings, so an apostrophe
    inside "don't" is never mistaken for a delimiter (a regex pass would
    pair the apostrophes of neighbouring contractions and mangle the
    payload)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == '"':  # copy a double-quoted string verbatim
            j = i + 1
            while j < n:
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == '"':
                    j += 1
                    break
                j += 1
            out.append(s[i:j])
            i = j
        elif c == "'":  # convert a single-quoted string
            j = i + 1
            buf: list[str] = []
            closed = False
            while j < n:
                if s[j] == "\\" and j + 1 < n:
                    buf.append(s[j + 1] if s[j + 1] in "'\"" else s[j:j + 2])
                    j += 2
                    continue
                if s[j] == "'":
                    closed = True
                    j += 1
                    break
                buf.append(s[j])
                j += 1
            if closed:
                out.append(json.dumps("".join(buf)))
                i = j
            else:  # unterminated — copy as-is, let json.loads reject it
                out.append(s[i:])
                i = n
        else:
            out.append(c)
            i += 1
    return "".join(out)


def repair_json(text: str):
    """Parse possibly-broken JSON; returns the object or None on failure."""
    if text is None:
        return None
    s = _FENCE_RE.sub("", text.strip())
    if not s:
        return None
    try:
        return json.loads(s)
    except Exception:
        pass
    fixed = _requote_single_quoted(s)
    fixed = _UNQUOTED_KEY_RE.sub(lambda m: m.group(1) + json.dumps(m.group(2)) + m.group(3), fixed)
    fixed = _TRAILING_COMMA_RE.sub(r"\1", fixed)
    try:
        return json.loads(fixed)
    except Exception:
        return None


def merge_list_of_dicts(parsed):
    """List-of-dicts → one dict; duplicate keys accumulate into lists.

    Mirrors reference benchmark.py:638-652 (non-dict items ignored).
    """
    if not isinstance(parsed, list):
        return parsed if isinstance(parsed, dict) else {}
    merged: dict = {}
    for item in parsed:
        if not isinstance(item, dict):
            continue
        for key, value in item.items():
            if key not in merged:
                merged[key] = value
            elif isinstance(merged[key], list):
                merged[key].append(value)
            else:
                merged[key] = [merged[key], value]
    return merged


def json_payload_to_markdown(text: str) -> dict:
    """Canonical markdown emission for a (possibly broken) JSON tool payload.

    Returns {md, ok}. md is a fenced canonical-JSON block; unparseable
    payloads fall back to the raw text (error-stub semantics mirroring the
    reference's per-page fallback, pdf2md.py:139-162 — a bad payload never
    fails the job).
    """
    parsed = repair_json(text)
    if parsed is None:
        return {"md": text.strip(), "ok": False}
    canon = json.dumps(parsed, ensure_ascii=False, indent=2, sort_keys=False)
    return {"md": "```json\n" + canon + "\n```", "ok": True}

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
  * Python literals True / False / None → true / false / null
  * bare-word values quoted ({"a": yes} → {"a": "yes"}) — EXCEPT the
    json.loads words NaN / Infinity (and -Infinity, which the bare-word
    regex never matches), which pass through as non-finite floats
    exactly as json_repair returns them
  * concatenated top-level values ({"a":1}{"b":2} → [{"a":1},{"b":2}],
    the list shape json_repair returns, ready for merge_list_of_dicts)
  * list-of-dicts → merged dict, dup keys append into a list

All repairs after the first are applied ONLY outside double-quoted string
literals (a segment scan, not whole-text regex), so payload text like
"True story, don't split" is never mangled.

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


_PY_CONSTS = {"True": "true", "False": "false", "None": "null"}
_JSON_WORDS = {"true", "false", "null", "NaN", "Infinity"}
_BARE_VALUE_RE = re.compile(
    r"(:\s*)([A-Za-z_][A-Za-z0-9_\- ]*?)(\s*[,}\]])")
# a Python constant counts only as a STANDALONE value/array element (next
# significant char closes or continues the container) — 'True story' is a
# bare string that must be quoted verbatim, not half-lowercased
_PY_CONST_RE = re.compile(r"(?<![\w\"'])(True|False|None)(?=\s*(?:[,\]\}]|$))")


def _map_outside_strings(s: str, fn) -> str:
    """Apply ``fn`` to the segments of ``s`` that are NOT inside
    double-quoted string literals (run after _requote_single_quoted, when
    every string is double-quoted) — structural repairs must never edit
    payload text."""
    out: list[str] = []
    i, seg_start, n = 0, 0, len(s)
    while i < n:
        if s[i] == '"':
            out.append(fn(s[seg_start:i]))
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
            i = seg_start = j
        else:
            i += 1
    out.append(fn(s[seg_start:]))
    return "".join(out)


def _fix_structural(seg: str) -> str:
    """All structural repairs for one outside-string segment, in an order
    where each step cannot re-trigger on the previous step's output: quote
    unquoted keys, convert standalone Python constants, quote bare-word
    values, drop trailing commas."""
    seg = _UNQUOTED_KEY_RE.sub(
        lambda m: m.group(1) + json.dumps(m.group(2)) + m.group(3), seg)
    seg = _PY_CONST_RE.sub(lambda m: _PY_CONSTS[m.group(1)], seg)
    seg = _BARE_VALUE_RE.sub(
        lambda m: m.group(1)
        + (m.group(2) if m.group(2) in _JSON_WORDS
           else json.dumps(m.group(2)))
        + m.group(3), seg)
    return _TRAILING_COMMA_RE.sub(r"\1", seg)


def _parse_concatenated(s: str):
    """Concatenated top-level CONTAINERS ('{..}{..}' or '{..}\\n[..]') →
    list, mirroring json_repair's multi-object recovery. Restricted to
    inputs starting with '{'/'[': free text like '2025-01-01' must stay
    unparsed (the raw-text fallback), not become a garbage scalar list.
    None unless at least two complete values consume the whole string."""
    s = s.strip()
    if not s or s[0] not in "{[":
        return None
    dec = json.JSONDecoder()
    vals = []
    i, n = 0, len(s)
    while i < n:
        while i < n and s[i] in " \t\r\n":
            i += 1
        if i >= n:
            break
        if s[i] not in "{[":
            return None
        try:
            v, i = dec.raw_decode(s, i)
        except Exception:
            return None
        vals.append(v)
    return vals if len(vals) >= 2 else None


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
    # requote first (every string becomes double-quoted), then ALL
    # structural regexes run only on outside-string segments — a comma or
    # 'key:'-looking text inside a payload string must never be edited
    fixed = _requote_single_quoted(s)
    fixed = _map_outside_strings(fixed, _fix_structural)
    try:
        return json.loads(fixed)
    except Exception:
        pass
    return _parse_concatenated(fixed)


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

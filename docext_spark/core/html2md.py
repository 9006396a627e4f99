"""X1/X2 — HTML markup → markdown with boilerplate stripping.

Output contract mirrors the reference's pdf→markdown prompt contract
(/root/reference/docext/core/pdf2md/pdf2md.py:90 and README.md:44-52):

- text in natural reading order, main content only ("as if reading naturally")
- tables re-emitted as (normalized) HTML
- checkboxes as ☐ / ☑
- ``<img>`` placeholders kept as literal ``<img>`` tags (escaping for display
  is a separate projection, see app/pdf2md.py:17-27 → operators.projections)

The *method* is not a model call: boilerplate classification uses
readability/trafilatura-style text-density + link-density heuristics
(public heuristics; see PAPERS.md), implemented natively.

Pure Python, deterministic, no Spark imports. Used by both the Spark pUDF
and the pytest oracle.
"""
from __future__ import annotations

import html as _html
import re

from docext_spark.core.tables import span_int

# Subtrees that are never main content (hard boilerplate).
_DROP_SUBTREE = {
    "script", "style", "nav", "footer", "header", "aside", "noscript",
    "form", "iframe", "svg", "button", "template", "select", "option",
}

# Tags that open a new output block.
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_BLOCK_OPEN = {"p", "div", "section", "article", "main", "li", "blockquote",
               "pre", "ul", "ol", "br", "body", "html", "tr"} | set(_HEADINGS)

_VOID = {"br", "img", "input", "hr", "meta", "link", "area", "base", "col",
         "embed", "source", "track", "wbr"}

# drop-set tags whose close is optional in HTML (a sibling start implies it)
_IMPLICIT_CLOSE = {"option"}

_WS_RE = re.compile(r"\s+")

# Boilerplate thresholds (trafilatura-style link-density heuristic).
LINK_DENSITY_MAX = 0.5
SHORT_BLOCK_CHARS = 200


class _Block:
    __slots__ = ("kind", "parts", "link_chars", "start", "end", "pre")

    def __init__(self, kind: str, start: int, pre: bool = False):
        self.kind = kind
        self.parts: list[str] = []
        self.link_chars = 0
        self.start = start
        self.end = start
        self.pre = pre

    def text(self) -> str:
        raw = "".join(self.parts)
        if self.pre:
            return raw.strip("\n")
        return _WS_RE.sub(" ", raw).strip()


# One-pass tag/comment/doctype tokenizer. ~6x faster than html.parser for
# this workload (profiled: stdlib goahead/parse_starttag dominated the
# extraction kernel); emits the same start/end/data event stream.
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                                   # comments
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"                         # CDATA
    r"|<[!?][^>]*>"                                       # doctype / PI
    r"|</?([a-zA-Z][a-zA-Z0-9-]*)"                        # tag name
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>",                # attrs
    re.S)
_ATTR_RE = re.compile(
    r"([a-zA-Z_][a-zA-Z0-9_:.-]*)\s*(?:=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?")
# tags whose attributes matter; everything else skips attribute parsing
_ATTR_TAGS = frozenset(("input", "td", "th"))
_CLASS_HINTS = ("watermark", "pageno", "page-number", "page_number")


class _Extractor:
    """Single-pass HTML tokenizer → ordered block list.

    Source character offsets (for kept-span lineage) come straight from the
    tokenizer match positions.
    """

    def __init__(self, raw: str):
        self.raw = raw
        self._pos = 0
        self._data_end = 0
        self.blocks: list[_Block] = []
        self._cur: _Block | None = None
        self._drop_depth = 0
        self._dropped_subtrees = 0
        self._drop_stack: list[str] = []
        self._link_depth = 0
        self._pre_depth = 0
        # table capture state
        self._table_depth = 0
        self._trows: list[list[tuple[str, int, int, str]]] = []
        self._tcell: list[str] | None = None
        self._tcell_meta: tuple[str, int, int] | None = None
        self._table_start = 0

    # -- tokenizer driver --------------------------------------------------
    def run(self):
        # hot loop: bind lookups once (small measured win, ~3%; byte
        # equality pinned by the pipeline goldens)
        raw = self.raw
        pos = 0
        handle_data = self.handle_data
        handle_endtag = self.handle_endtag
        handle_starttag_raw = self.handle_starttag_raw
        unescape = _html.unescape
        for m in _TOKEN_RE.finditer(raw):
            start = m.start()
            if start > pos:
                data = raw[pos:start]
                self._pos = pos
                self._data_end = start
                handle_data(unescape(data) if "&" in data else data)
            pos = m.end()
            tag = m.group(1)
            if tag is None:
                continue  # comment / doctype / CDATA / PI
            self._pos = start
            tag = tag.lower()
            if raw[start + 1] == "/":
                handle_endtag(tag)
            else:
                attrs_raw = m.group(2) or ""
                handle_starttag_raw(tag, attrs_raw)
                # XML-style self-closing tag: emit the matching end event so
                # subtree state (drop depth, table capture) can't leak open.
                # Only when the '/' stands alone ('<br/>', '<x a="1"/>') —
                # an unquoted attribute value ending in '/' (e.g.
                # href=http://x.com/) is part of the VALUE per the HTML5
                # tokenizer, not a self-close
                stripped = attrs_raw.rstrip()
                if (stripped.endswith("/") and tag not in _VOID
                        and (len(stripped) == 1
                             or stripped[-2] in " \t\n\r\f\"'")):
                    handle_endtag(tag)
        if pos < len(raw):
            data = raw[pos:]
            self._pos = pos
            self._data_end = len(raw)
            handle_data(unescape(data) if "&" in data else data)

    def handle_starttag_raw(self, tag: str, attrs_raw: str):
        """Lazy attribute parsing: most tags never need their attributes."""
        al = attrs_raw.lower() if attrs_raw else ""
        if al and (tag in _ATTR_TAGS or any(h in al for h in _CLASS_HINTS)):
            attrs = [(k.lower(), v1 if v1 is not None else
                      (v2 if v2 is not None else v3))
                     for k, v1, v2, v3 in _ATTR_RE.findall(attrs_raw)]
        else:
            attrs = ()
        self.handle_starttag(tag, attrs)

    def _offset(self) -> int:
        return self._pos

    # -- block helpers --------------------------------------------------
    def _open_block(self, kind: str):
        self._flush()
        self._cur = _Block(kind, self._offset(), pre=self._pre_depth > 0)

    def _flush(self):
        if self._cur is not None and (self._cur.parts or self._cur.kind == "table"):
            self.blocks.append(self._cur)
        self._cur = None

    def _ensure_block(self):
        if self._cur is None:
            self._cur = _Block("p", self._offset(), pre=self._pre_depth > 0)

    # -- parser events ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if self._drop_depth > 0:
            if tag in _DROP_SUBTREE and tag not in _VOID:
                # sibling start of the same HTML-optional-close tag
                # (<option>a<option>b) implicitly closes the previous one —
                # don't deepen, or an unclosed run swallows the document
                if not (self._drop_stack and self._drop_stack[-1] == tag
                        and tag in _IMPLICIT_CLOSE):
                    self._drop_depth += 1
                    self._drop_stack.append(tag)
            return
        if tag in _DROP_SUBTREE:
            self._drop_depth = 1
            self._drop_stack = [tag]
            self._dropped_subtrees += 1
            self._flush()
            return
        if self._table_depth > 0:
            if tag == "table":
                # nested table: flatten its text into the open outer cell
                # (structure capture happens only at depth 1)
                self._table_depth += 1
            elif tag == "tr":
                if self._table_depth == 1:
                    # </td> and </tr> are optional per the HTML spec — a
                    # sibling start implicitly closes the open cell
                    self._close_tcell()
                    self._trows.append([])
            elif tag in ("td", "th"):
                if self._table_depth == 1:
                    self._close_tcell()
                    ad = dict(attrs)
                    self._tcell = []
                    self._tcell_meta = (tag, span_int(ad.get("rowspan")),
                                        span_int(ad.get("colspan")))
            elif tag == "input":
                ad = dict(attrs)
                if (ad.get("type") or "").lower() == "checkbox" and self._tcell is not None:
                    self._tcell.append("☑" if "checked" in ad else "☐")
            return
        if tag == "table":
            self._flush()
            self._table_depth = 1
            self._trows = []
            self._table_start = self._offset()
            return
        # docext output contract (pdf2md.py:90): watermarks and page numbers
        # wrapped in tags — detected from the markup's own class/id hints
        cls = ""
        for k, v in attrs:
            if k in ("class", "id") and v:
                cls += " " + v.lower()
        if "watermark" in cls:
            self._open_block("watermark")
            return
        if "page-number" in cls or "pageno" in cls or "page_number" in cls:
            self._open_block("page_number")
            return
        if tag == "a":
            self._link_depth += 1
            self._ensure_block()
            return
        if tag == "pre":
            self._pre_depth += 1
            self._open_block("pre")
            return
        if tag in _HEADINGS:
            self._open_block(tag)
            return
        if tag == "img":
            self._ensure_block()
            self._cur.parts.append("<img>")
            return
        if tag == "input":
            ad = dict(attrs)
            if (ad.get("type") or "").lower() == "checkbox":
                self._ensure_block()
                self._cur.parts.append("☑ " if "checked" in ad else "☐ ")
            return
        if tag in _BLOCK_OPEN:
            if tag == "br":
                if self._cur is not None:
                    self._cur.parts.append("\n" if self._pre_depth else " ")
                return
            if tag == "li":
                self._open_block("li")
                return
            if tag == "blockquote":
                self._open_block("blockquote")
                return
            self._flush()
            return
        # inline tags (span, b, i, em, strong, code, ...): transparent

    def handle_endtag(self, tag):
        if self._drop_depth > 0:
            if tag in self._drop_stack:
                # pop through implicitly-closed children up to this tag
                while self._drop_stack:
                    popped = self._drop_stack.pop()
                    self._drop_depth -= 1
                    if popped == tag:
                        break
            return
        if self._table_depth > 0:
            if tag == "table":
                self._table_depth -= 1
                if self._table_depth == 0:
                    self._close_tcell()  # unclosed trailing cell
                    self._emit_table()
            elif tag in ("td", "th", "tr") and self._table_depth == 1:
                # </tr> also closes an open cell whose </td> was omitted
                self._close_tcell()
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
            return
        if tag == "pre":
            self._pre_depth = max(0, self._pre_depth - 1)
            self._flush()
            return
        if tag == "span":
            # only a span that OPENED a tagged block (watermark/page_number)
            # closes it; plain inline spans stay transparent
            if self._cur is not None and self._cur.kind in ("watermark",
                                                            "page_number"):
                self._flush()
            return
        if tag in _HEADINGS or tag in ("p", "li", "div", "blockquote", "section",
                                       "article", "main", "ul", "ol"):
            self._flush()

    def handle_data(self, data):
        if self._drop_depth > 0:
            return
        if self._table_depth > 0:
            if self._tcell is not None:
                self._tcell.append(data)
            return
        if not data.strip() and self._cur is None:
            return
        self._ensure_block()
        self._cur.parts.append(data)
        if self._link_depth > 0:
            self._cur.link_chars += len(data.strip())
        self._cur.end = self._data_end

    def _close_tcell(self):
        """Flush the open table cell (explicit </td>, or implied by a
        sibling <td>/<tr>, </tr>, or </table> — the HTML-optional-close
        rules real pages rely on)."""
        if self._tcell is None:
            return
        t, rs, cs = self._tcell_meta
        txt = _WS_RE.sub(" ", "".join(self._tcell)).strip()
        if not self._trows:
            self._trows.append([])
        self._trows[-1].append((t, rs, cs, txt))
        self._tcell = None

    def _emit_table(self):
        rows_html = []
        for row in self._trows:
            cells = []
            for tag, rs, cs, txt in row:
                attrs = ""
                if rs > 1:
                    attrs += f' rowspan="{rs}"'
                if cs > 1:
                    attrs += f' colspan="{cs}"'
                cells.append(f"<{tag}{attrs}>{txt}</{tag}>")
            rows_html.append("<tr>" + "".join(cells) + "</tr>")
        blk = _Block("table", self._table_start)
        blk.parts = ["<table>" + "".join(rows_html) + "</table>"]
        blk.end = self._offset()
        blk.pre = True  # do not whitespace-collapse the html
        self.blocks.append(blk)


def html_to_markdown(raw: str) -> dict:
    """Convert an HTML fragment to main-content markdown.

    Returns dict with:
      md                  markdown string (blocks joined by blank lines)
      spans               list of (label, start, end) kept source char spans
      blocks_kept         int
      blocks_dropped      int  (boilerplate-classified + dropped subtrees)
      classifier_decisions int (total blocks evaluated)
    """
    parser = _Extractor(raw)
    try:
        parser.run()
    except Exception:
        # malformed markup: fall back to tag-stripped text, still deterministic
        text = _WS_RE.sub(" ", re.sub(r"<[^>]*>", " ", raw)).strip()
        return {
            "md": text,
            "spans": [("p", 0, len(raw))] if text else [],
            "blocks_kept": 1 if text else 0,
            "blocks_dropped": 0,
            "classifier_decisions": 1,
        }
    parser._flush()

    out: list[str] = []
    spans: list[tuple[str, int, int]] = []
    kept = 0
    dropped = parser._dropped_subtrees
    decisions = parser._dropped_subtrees

    for blk in parser.blocks:
        decisions += 1
        text = blk.text()
        n = len(text)
        if n == 0:
            dropped += 1
            continue
        if blk.kind != "table":
            link_density = blk.link_chars / max(n, 1)
            if link_density > LINK_DENSITY_MAX and n < SHORT_BLOCK_CHARS:
                dropped += 1
                continue
        if blk.kind in _HEADINGS:
            text = "#" * _HEADINGS[blk.kind] + " " + text
        elif blk.kind == "watermark":
            text = f"<watermark>{text}</watermark>"
        elif blk.kind == "page_number":
            text = f"<page_number>{text}</page_number>"
        elif blk.kind == "li":
            text = "- " + text
        elif blk.kind == "blockquote":
            text = "> " + text
        elif blk.kind == "pre":
            text = "```\n" + text + "\n```"
        out.append(text)
        spans.append((blk.kind, blk.start, blk.end))
        kept += 1

    return {
        "md": "\n\n".join(out),
        "spans": spans,
        "blocks_kept": kept,
        "blocks_dropped": dropped,
        "classifier_decisions": decisions,
    }


# P4 — display tag escaping (reference: app/pdf2md.py:17-27)
_TAG_PAIRS = ["img", "watermark", "page_number", "signature"]


def escape_display_tags(md: str) -> str:
    """``<img>`` → ``&lt;img&gt;`` etc. for the 4 display tag pairs."""
    for t in _TAG_PAIRS:
        md = md.replace(f"<{t}>", f"&lt;{t}&gt;").replace(f"</{t}>", f"&lt;/{t}&gt;")
    return md

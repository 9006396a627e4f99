"""X5 — table extraction kernels: pipe-table slice/parse, HTML grid parse.

Reference semantics:
  * pipe slice: ``response[response.index("|") : response.rindex("|")+1]``
    then mdpd.from_md (/root/reference/docext/core/extract.py:118-119)
  * HTML table → cell list with rowspan/colspan grid occupancy
    (/root/reference/docext/benchmark/metrics/grits.py:447-507)

Pure Python, deterministic, no Spark imports.
"""
from __future__ import annotations

import re

_SEP_ROW_RE = re.compile(r"^\s*:?-{3,}:?\s*$")


def span_int(v, default: int = 1) -> int:
    """Defensive rowspan/colspan parse: '50%', '', None → default instead
    of raising (a bad attribute must never fail a whole payload)."""
    try:
        return max(1, int(v))
    except (TypeError, ValueError):
        return default


def slice_pipe_region(text: str) -> str | None:
    """Substring from first '|' to last '|' inclusive (extract.py:118)."""
    try:
        return text[text.index("|"): text.rindex("|") + 1]
    except ValueError:
        return None


def parse_pipe_table(text: str) -> dict:
    """Parse a markdown pipe table region into header + rows.

    Returns {"columns": [...], "rows": [[...], ...]}; empty dict shapes when
    no table found. First row = header, ``---`` separator rows skipped
    (mdpd.from_md semantics).
    """
    region = slice_pipe_region(text)
    if region is None:
        return {"columns": [], "rows": []}
    lines = [ln for ln in region.splitlines() if "|" in ln]
    grid: list[list[str]] = []
    for ln in lines:
        cells = [c.strip() for c in ln.strip().strip("|").split("|")]
        if all(_SEP_ROW_RE.match(c) for c in cells if c != "") and any(c for c in cells):
            continue
        grid.append(cells)
    if not grid:
        return {"columns": [], "rows": []}
    columns = grid[0]
    width = len(columns)
    rows = [(r + [""] * width)[:width] for r in grid[1:]]
    return {"columns": columns, "rows": rows}


def pipe_table_to_html(text: str) -> str | None:
    """Pipe table region → normalized HTML table (docext md contract:
    'Return the tables in html format', pdf2md.py:90)."""
    parsed = parse_pipe_table(text)
    if not parsed["columns"]:
        return None
    head = "<tr>" + "".join(f"<th>{c}</th>" for c in parsed["columns"]) + "</tr>"
    body = "".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
        for row in parsed["rows"])
    return "<table>" + head + body + "</table>"


_TAG_RE = re.compile(r"<(/?)(\w+)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>", re.S)
_ATTR_RE = re.compile(r"(\w+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|(\S+))")


def html_table_to_cells(table_html: str) -> list[dict]:
    """HTML table → list of cells with row_nums/column_nums occupancy.

    Same output contract as reference grits.py:447-507 (html_to_cells):
    each cell dict has row_nums, column_nums, is_column_header, cell_text.
    Implemented with a tolerant regex tokenizer instead of ElementTree so
    non-XML-wellformed tables still parse.
    """
    cells: list[dict] = []
    occupied: dict[int, set[int]] = {}
    current_row = -1
    in_header_depth = 0
    cell_meta: tuple[int, int, bool] | None = None  # rowspan, colspan, is_th
    cell_text: list[str] = []
    pos = 0

    def _close_cell():
        nonlocal cell_meta, cell_text, current_row
        if cell_meta is None:
            return
        # a <td> with no preceding <tr> (model output does this) would emit
        # row_nums=[-1] and crash every grid builder downstream — clamp to
        # an implicit row 0. (The reference ET walker has the same -1 hole
        # and crashes in cells_to_grid; our kernels must be total.)
        if current_row < 0:
            current_row = 0
        rowspan, colspan, is_th = cell_meta
        row_nums = list(range(current_row, current_row + rowspan))
        occ = occupied.setdefault(current_row, set())
        col = 0
        while col in occ:
            col += 1
        column_nums = list(range(col, col + colspan))
        for rn in row_nums:
            occupied.setdefault(rn, set()).update(column_nums)
        cells.append({
            "row_nums": row_nums,
            "column_nums": column_nums,
            "is_column_header": is_th or in_header_depth > 0,
            # ' '.join between fragments matches the reference's
            # ' '.join(itertext()) (grits.py:503) — <td>a<b>b</b></td> must
            # yield 'a b', not 'ab'; the collapse then canonicalizes runs
            "cell_text": re.sub(r"\s+", " ", " ".join(cell_text)).strip(),
        })
        cell_meta = None
        cell_text = []

    for m in _TAG_RE.finditer(table_html):
        if cell_meta is not None:
            cell_text.append(table_html[pos:m.start()])
        pos = m.end()
        closing, tag, attrs_raw = m.group(1) == "/", m.group(2).lower(), m.group(3)
        if tag == "thead":
            in_header_depth += -1 if closing else 1
            in_header_depth = max(0, in_header_depth)
        elif tag == "tr":
            if not closing:
                _close_cell()
                current_row += 1
        elif tag in ("td", "th"):
            if closing:
                _close_cell()
            else:
                _close_cell()
                attrs = {k.lower(): (v1 or v2 or v3 or "")
                         for k, v1, v2, v3 in _ATTR_RE.findall(attrs_raw)}
                cell_meta = (span_int(attrs.get("rowspan", "1")),
                             span_int(attrs.get("colspan", "1")),
                             tag == "th")
    _close_cell()
    return cells


def cells_to_text_grid(cells: list[dict]) -> list[list[str]]:
    """Dense rows×cols matrix of cell_text (reference grits.py:252-271)."""
    if not cells:
        return [[]]
    num_rows = max(max(c["row_nums"]) for c in cells) + 1
    num_cols = max(max(c["column_nums"]) for c in cells) + 1
    grid = [["" for _ in range(num_cols)] for _ in range(num_rows)]
    for c in cells:
        for r in c["row_nums"]:
            for k in c["column_nums"]:
                grid[r][k] = c["cell_text"]
    return grid

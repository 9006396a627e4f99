"""X3 — PDF layout-block ordering → markdown.

The reference converts PDFs page-by-page and concatenates with per-page
headers ``Page {i+1} of {N}\\n`` (/root/reference/docext/core/pdf2md/
pdf2md.py:126-135). Our payload analog (FIXTURES.md §1): a PDF-extracted
block stream, one block per line ``page|y|x|text``, lines possibly out of
order. We restore natural reading order by sorting blocks (page, y, x) and
emit per-page headers in the reference's exact format.

Pure Python, deterministic, no Spark imports.
"""
from __future__ import annotations

import re

_BLOCK_RE = re.compile(r"^(\d+)\|(\d+)\|(\d+)\|(.*)$")


def looks_like_pdf_blocks(text: str) -> bool:
    """True if the payload is a pdf block stream (first 3 non-empty lines)."""
    seen = 0
    for line in text.splitlines():
        if not line.strip():
            continue
        if not _BLOCK_RE.match(line):
            return False
        seen += 1
        if seen >= 3:
            break
    return seen > 0


def pdf_blocks_to_markdown(text: str) -> dict:
    """Sort ``page|y|x|text`` lines into reading order with page headers.

    Returns {md, n_pages, n_blocks}.
    """
    blocks: list[tuple[int, int, int, str]] = []
    for line in text.splitlines():
        if not line.strip():
            continue
        m = _BLOCK_RE.match(line)
        if m:
            blocks.append((int(m.group(1)), int(m.group(2)), int(m.group(3)),
                           m.group(4)))
    blocks.sort(key=lambda b: (b[0], b[1], b[2]))
    pages: list[int] = []
    for b in blocks:
        if not pages or pages[-1] != b[0]:
            pages.append(b[0])
    n = len(pages)
    parts: list[str] = []
    for i, p in enumerate(pages):
        lines = [b[3] for b in blocks if b[0] == p]
        # header format per reference pdf2md.py:128 ("Page {i+1} of {N}\n")
        parts.append(f"Page {i + 1} of {n}\n" + "\n".join(lines))
    return {"md": "\n".join(parts), "n_pages": n, "n_blocks": len(blocks)}

"""Core-app prompt builders (reference docext/core/prompts.py:9-89) —
the interactive extraction path's message structures, as pure kernels
(config-scale: one list per request; the benchmark-scale projection lives
in operators/messages.py).

- Field names normalize exactly like the reference (' '→'_', lower —
  prompts.py:11-15, the P1 rule).
- The table output format replicates pandas.DataFrame.to_markdown
  (tabulate 'pipe' format): column slot = max(len(header) + 2, widest
  cell) (tabulate MIN_PADDING = 2 on headers), left-aligned ':---'
  separator — verified against the worked example in the pandas
  to_markdown documentation.
- Image payloads: the reference inlines base64 file bytes
  (prompts.py:40-44); this sandbox has no files, so the url carries the
  same unresolved-ref marker as operators/messages.py.
"""
from __future__ import annotations

# ONE implementation of the P1 rule — prompt construction and field
# extraction must agree on normalized names or extraction misses fields
from docext_spark.core.fields import normalize_field_name as normalize_field


def name_desc_prompt(fields: list[str], descriptions: list[str]) -> str:
    """prompts.py:9-15: one 'name: description' line per field."""
    return "\n".join(f"{normalize_field(f)}: {d}"
                     for f, d in zip(fields, descriptions))


def fields_output_format(fields: list[str]) -> dict:
    """prompts.py:18-19."""
    return {normalize_field(f): "..." for f in fields}


def markdown_table_format(columns: list[str], row: list[str] | None = None) -> str:
    """tabulate 'pipe' format of a one-row table (prompts.py:56-57
    pd.DataFrame({col: ['..']}).to_markdown(index=False))."""
    cells = row if row is not None else [".."] * len(columns)
    widths = [max(len(c) + 2, len(v)) for c, v in zip(columns, cells)]
    head = "| " + " | ".join(c.ljust(w) for c, w in zip(columns, widths)) + " |"
    sep = "|" + "|".join(":" + "-" * (w + 1) for w in widths) + "|"
    body = "| " + " | ".join(v.ljust(w) for v, w in zip(cells, widths)) + " |"
    return "\n".join((head, sep, body))


def _image_item(ref: str) -> dict:
    return {"type": "image_url",
            "image_url": {"url": f"data:image/jpeg;base64,<unresolved:{ref}>"}}


def get_fields_messages(fields: list[str], descriptions: list[str],
                        image_refs: list[str]) -> list[dict]:
    """prompts.py:22-52: one user message — task text, 'Documents:' text,
    one image item per page, output-format instruction."""
    return [{
        "role": "user",
        "content": [
            {"type": "text",
             "text": "Extract the following fields from the documents:\n "
                     f"{name_desc_prompt(fields, descriptions)}."},
            {"type": "text", "text": "Documents:\n"},
            *[_image_item(r) for r in image_refs],
            {"type": "text",
             "text": "Return a JSON with the following format:\n "
                     f"{fields_output_format(fields)}. If a field is not "
                     "found, return '' for that field. Do not give any "
                     "explanation."},
        ],
    }]


def get_tables_messages(columns: list[str], descriptions: list[str],
                        image_refs: list[str]) -> list[dict]:
    """prompts.py:59-89: table variant — markdown output format."""
    return [{
        "role": "user",
        "content": [
            {"type": "text",
             "text": "Extract the following columns from the documents:\n "
                     f"{name_desc_prompt(columns, descriptions)}."},
            {"type": "text", "text": "Documents:\n"},
            *[_image_item(r) for r in image_refs],
            {"type": "text",
             "text": "Return the table as an markdown table:\n "
                     f"{markdown_table_format(columns)}. If a cell is not "
                     "found, return '' for that column. Do not give any "
                     "explanation."},
        ],
    }]

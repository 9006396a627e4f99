"""Extraction request schema: templates + validation (the dynamic,
user-defined schema surface of the reference).

Reference: field/table templates (/root/reference/docext/core/config.py:
3-75), structural validation (core/utils.py:18-46 — must carry ``fields``
and ``tables`` keys, every entry a name), missing-description default ''.
The request schema parameterizes the generated extraction expressions
(operators.extract.make_fields_udf) — it is config, never data-plane state.
"""
from __future__ import annotations

# canonical field templates (labels match the reference's demo templates so
# benchmark fixtures line up; descriptions abbreviated)
TEMPLATES_FIELDS: dict[str, list[dict]] = {
    "invoice": [
        {"name": "invoice_number", "description": "Invoice number"},
        {"name": "invoice_date", "description": "Invoice date"},
        {"name": "invoice_amount", "description": "Invoice amount"},
        {"name": "invoice_currency", "description": "Invoice currency"},
        {"name": "seller_name", "description": "Seller name"},
        {"name": "buyer_name", "description": "Buyer name"},
        {"name": "seller_address", "description": "Seller address"},
        {"name": "buyer_address", "description": "Buyer address"},
        {"name": "seller_tax_id", "description": "Seller tax id"},
        {"name": "buyer_tax_id", "description": "Buyer tax id"},
    ],
    "passport": [
        {"name": "full_name", "description": "Full name"},
        {"name": "date_of_birth", "description": "Date of birth YYYY-MM-DD"},
        {"name": "passport_number", "description": "Passport number"},
        {"name": "date_of_issue", "description": "Date of issue"},
        {"name": "date_of_expiry", "description": "Date of expiry"},
        {"name": "nationality", "description": "Nationality"},
        {"name": "gender", "description": "Gender"},
    ],
}

TEMPLATES_TABLES: dict[str, list[dict]] = {
    "invoice": [
        {"name": "item_description", "description": "Line item description"},
        {"name": "item_quantity", "description": "Line item quantity"},
        {"name": "item_price", "description": "Line item unit price"},
        {"name": "item_total", "description": "Line item total"},
    ],
}


class RequestSchemaError(ValueError):
    pass


def validate_request(req: dict) -> dict:
    """Structural validation mirroring core/utils.py:18-46:
    - dict with 'fields' and 'tables' keys (missing → empty list)
    - every entry a dict with a non-empty 'name'
    - 'description' defaults to ''
    - 'type' defaults to 'field' / 'table' by section
    Returns the normalized request.
    """
    if not isinstance(req, dict):
        raise RequestSchemaError("request must be a dict")
    out = {"fields": [], "tables": []}
    for section in ("fields", "tables"):
        entries = req.get(section, [])
        if not isinstance(entries, list):
            raise RequestSchemaError(f"'{section}' must be a list")
        for e in entries:
            if not isinstance(e, dict) or not str(e.get("name", "")).strip():
                raise RequestSchemaError(
                    f"every {section} entry needs a non-empty 'name'")
            out[section].append({
                "name": str(e["name"]).strip(),
                "description": str(e.get("description", "")),
                "type": "field" if section == "fields" else "table",
            })
    return out

from __future__ import annotations

import pytest

from docext_spark.core.fields import numeric_confidence
from docext_spark.core.requests import (RequestSchemaError, TEMPLATES_FIELDS,
                                        validate_request)


def test_validate_normalizes():
    req = validate_request({"fields": [{"name": " invoice_number "}],
                            "tables": []})
    assert req["fields"][0] == {"name": "invoice_number", "description": "",
                                "type": "field"}


def test_validate_rejects_bad_shapes():
    with pytest.raises(RequestSchemaError):
        validate_request({"fields": [{"description": "no name"}]})
    with pytest.raises(RequestSchemaError):
        validate_request({"fields": "nope"})
    with pytest.raises(RequestSchemaError):
        validate_request("nope")


def test_templates_validate():
    for name, fields in TEMPLATES_FIELDS.items():
        out = validate_request({"fields": fields, "tables": []})
        assert len(out["fields"]) == len(fields), name


def test_numeric_confidence_contract():
    assert numeric_confidence(["x"]) == 100
    assert numeric_confidence(["x", "y"]) == 50
    assert numeric_confidence([]) == 0


def test_core_prompt_builders():
    """Core-app prompt builders (reference prompts.py:9-89): field-name
    normalization, name:description lines, message structure, markdown
    output-format table."""
    from docext_spark.core.prompts import (fields_output_format,
                                           get_fields_messages,
                                           get_tables_messages,
                                           markdown_table_format,
                                           name_desc_prompt)
    assert name_desc_prompt(["Invoice Number", "total"],
                            ["the id", "sum"]) == \
        "invoice_number: the id\ntotal: sum"
    assert fields_output_format(["Invoice Number"]) == {"invoice_number": "..."}

    msgs = get_fields_messages(["Invoice Number"], ["the id"],
                               ["a.png", "b.png"])
    assert len(msgs) == 1 and msgs[0]["role"] == "user"
    content = msgs[0]["content"]
    # task text, Documents:, 2 images, output format — in that order
    assert [c["type"] for c in content] == ["text", "text", "image_url",
                                            "image_url", "text"]
    assert "invoice_number: the id" in content[0]["text"]
    assert "{'invoice_number': '...'}" in content[-1]["text"]

    # tabulate-pipe layout verified against the pandas to_markdown doc
    # example: slot = max(len(header)+2, widest cell), ':---' left align
    assert markdown_table_format(["animal_1", "animal_2"],
                                 ["elk", "dog"]) == (
        "| animal_1   | animal_2   |\n"
        "|:-----------|:-----------|\n"
        "| elk        | dog        |")
    tmsgs = get_tables_messages(["col a"], ["desc"], ["t.png"])
    # reference normalizes names only in the description prompt; the
    # markdown format uses RAW column names (prompts.py:56-57)
    assert "| col a   |" in tmsgs[0]["content"][-1]["text"]
    assert "col_a: desc" in tmsgs[0]["content"][0]["text"]

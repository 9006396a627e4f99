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

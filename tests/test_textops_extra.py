"""PII redaction + repetition signals (beyond-parity curation ops)."""
from __future__ import annotations

from pyspark.sql import functions as F

from docext_spark.operators.textops import (dup_line_frac, max_token_frac,
                                            pii_counts, redact_pii,
                                            repetition_gate)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(expr(F.col("t")).alias("v")).collect()[0]["v"]


def test_redact_pii_all_kinds(spark):
    text = ("reach me at jane.doe+spam@mail.example.org or +1 (555) 010-4242"
            " server 192.168.0.17 card 4111111111111111 done")
    got = _one(spark, text, redact_pii)
    assert got == ("reach me at <EMAIL> or <PHONE>"
                   " server <IP> card <NUMBER> done")
    counts = {k: _one(spark, text, lambda c, k=k: pii_counts(c)[k])
              for k in ("email", "ip", "number", "phone")}
    assert counts == {"email": 1, "ip": 1, "number": 1, "phone": 1}


def test_redact_pii_no_false_positives_on_prose(spark):
    text = "version 2.0 of the spec ships in 2026 with 3 parts"
    assert _one(spark, text, redact_pii) == text


def test_repetition_signals(spark):
    assert _one(spark, "a\nb\na\nb", dup_line_frac) == 0.5
    assert _one(spark, "a\nb\nc\nd", dup_line_frac) == 0.0
    assert _one(spark, "x x x y", max_token_frac) == 0.75
    assert _one(spark, "spam " * 50 + "eggs", repetition_gate) is False
    assert _one(spark, "all tokens here are fully distinct words",
                repetition_gate) is True

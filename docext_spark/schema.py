"""Canonical StructTypes (SURVEY.md §1).

The transcript schema is fixed by BASELINE.json input_hint; extraction
output and metrics schemas are ours.
"""
from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

SPAN_TYPE = T.ArrayType(T.StructType([
    T.StructField("label", T.StringType(), False),
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
]))

# output of the per-turn extraction pUDF (core.convert.turn_to_markdown)
EXTRACTION_STRUCT = T.StructType([
    T.StructField("md", T.StringType(), True),
    T.StructField("kind", T.StringType(), True),
    T.StructField("blocks_kept", T.IntegerType(), True),
    T.StructField("blocks_dropped", T.IntegerType(), True),
    T.StructField("classifier_decisions", T.IntegerType(), True),
    T.StructField("spans", SPAN_TYPE, True),
    T.StructField("parse_ok", T.BooleanType(), True),
])

# per-partition lineage/metrics rows (A13)
LINEAGE_SCHEMA = T.StructType([
    T.StructField("part_id", T.IntegerType(), False),
    T.StructField("turns_processed", T.LongType(), False),
    T.StructField("spans_emitted", T.LongType(), False),
    T.StructField("classifier_decisions", T.LongType(), False),
    T.StructField("parse_failures", T.LongType(), False),
])

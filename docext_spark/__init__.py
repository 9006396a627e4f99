"""docext_spark — a from-scratch PySpark-native extraction/analytics engine.

Re-expresses the capabilities of the reference repo (NanoNets/docext mirror,
read-only at /root/reference) as an idiomatic Spark engine:

- ``core/``       pure-Python computation kernels (NO Spark imports) — the
                  single source of truth shared by the Spark pandas-UDFs and
                  the pytest/DuckDB oracle (SURVEY.md §7.4 risk #1: one
                  implementation, two carriers).
- ``operators/``  Spark DataFrame operators: extraction pUDFs, metrics,
                  dedup, similarity, reassembly windows.
- ``sources/``    table IO: transcripts read/write, checkpoint/resume
                  protocol, driver testdata loaders.
- ``plans/``      end-to-end pipelines (scan → extract → reassemble → write)
                  and lineage/metrics emission.
- ``streaming/``  Structured Streaming metrics feed (availableNow).

Design stance (SURVEY.md §7.0): no per-row Python on the hot path — native
Catalyst expressions wherever possible, Arrow-batched pandas UDFs where not.
"""

__version__ = "0.1.0"

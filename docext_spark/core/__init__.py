"""Pure-Python computation kernels. No Spark imports allowed here.

These functions are executed in two carriers:
1. inside Arrow-batched pandas UDFs (docext_spark.operators.extract)
2. directly by pytest / the DuckDB-oracle harness (tests/)

so that per-turn byte equality between the Spark pipeline and the oracle is
guaranteed by construction (SURVEY.md §7.4 risk #1).
"""

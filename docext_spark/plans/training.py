"""Conversation → training-example emission: the last pipeline step
between "curated corpus" and "training data" (VERDICT r4 #7).

Composes gap-based sessionization (operators/sessionize.py) with
token-budget chunking: a months-long per-entity event/turn stream is split
into sessions, each session is cut into contiguous token-budgeted training
samples, and every sample carries provenance (entity, session, chunk,
event count, time bounds) plus the ordered concatenated text.

Chunking rule — BUDGET-BOUNDARY packing, chosen for scale + parity:
an event goes into chunk ``floor(tokens_before_it_in_session / budget)``.
That is one window expression (no recursion, no driver loop), identical
in Spark and ANSI SQL, and fully deterministic. A chunk may overshoot the
budget by less than the straddling event's own token count (an event is
never split); a single event larger than the budget still lands in
exactly one chunk. Exact greedy bin-packing would need a sequential scan
per session — wrong shape for a 10^12-turn corpus and not expressible as
a window.

Scale shape: ONE shuffle on the entity key (shared by the sessionize
window, the chunk window, and the final groupBy — AQE plans the groupBy
shuffle-free since its key extends the window partitioning), map-side
partial aggregation for the rollup, no UDFs anywhere.

The reference has no training-data emission (single-document tool); this
is part of the beyond-parity training-data surface (SURVEY §2 extras).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docext_spark.operators.sessionize import sessionize
from docext_spark.operators.textops import token_count


def sessions_to_training_samples(df: DataFrame, entity_col: str = "user_id",
                                 ts_col: str = "ts",
                                 text_col: str = "text",
                                 gap_minutes: float = 30.0,
                                 budget_tokens: int = 512,
                                 tiebreak_col: str | None = None,
                                 sep: str = "\n") -> DataFrame:
    """One row per training sample:
    (entity, session_idx, session_id, chunk_idx, sample_id, n_events,
    n_tokens, sample_start, sample_end, sample_text).

    sample_id is content-addressed ("<session_id>/<chunk_idx>") — stable
    across reruns, repartitions, and cluster sizes. sample_text is the
    (ts, tiebreak)-ordered concatenation; pass ``tiebreak_col`` whenever
    equal timestamps are possible or the text order is nondeterministic."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive: {budget_tokens}")
    s = sessionize(df, entity_col, ts_col, gap_minutes, tiebreak_col)
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = (Window.partitionBy(entity_col, "session_idx").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, -1))
    tok = token_count(F.col(text_col))
    s = (s.withColumn("_tok", tok)
          .withColumn("chunk_idx",
                      F.floor(F.coalesce(F.sum("_tok").over(w), F.lit(0))
                              / budget_tokens)))
    # ordered reassembly without a second sort: collect (ts, tiebreak,
    # text) structs and array_sort — lexicographic struct order IS the
    # window order (same pattern as W1 stable reassembly)
    key = [F.col(ts_col).alias("_o1")]
    if tiebreak_col is not None:
        key.append(F.col(tiebreak_col).alias("_o2"))
    piece = F.struct(*key, F.col(text_col).alias("_t"))
    return (s.groupBy(F.col(entity_col), F.col("session_idx"),
                      F.col("session_id"), F.col("chunk_idx"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("_tok").alias("n_tokens"),
                 F.min(ts_col).alias("sample_start"),
                 F.max(ts_col).alias("sample_end"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list(piece)),
                                 lambda x: x["_t"]), sep)
                  .alias("sample_text"))
            .withColumn("sample_id",
                        F.concat_ws("/", F.col("session_id"),
                                    F.col("chunk_idx").cast("string"))))


def training_funnel(df: DataFrame, entity_col: str = "user_id",
                    ts_col: str = "ts", text_col: str = "text",
                    gap_minutes: float = 30.0, budget_tokens: int = 512,
                    tiebreak_col: str | None = None) -> DataFrame:
    """One-row provenance rollup for the emission run: events in, sessions
    formed, samples emitted, tokens packed — the audit trail a pipeline
    operator reads before shipping the samples to a trainer."""
    samples = sessions_to_training_samples(
        df, entity_col, ts_col, text_col, gap_minutes, budget_tokens,
        tiebreak_col)
    return samples.agg(
        F.sum("n_events").alias("n_events"),
        F.countDistinct(entity_col).alias("n_entities"),
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max("n_tokens").alias("max_sample_tokens"))

"""Streaming conversation → training-sample emission — the streaming twin
of plans/training.py (same sessionize + budget-boundary packing rule),
built on ``applyInPandasWithState``.

Per-entity state carries the OPEN tail: current session index, the
session's running token count, and the open chunk's buffered events
(bounded — a chunk holds at most budget_tokens plus one straddling
event). A sample is emitted the moment it CLOSES — either the session's
cumulative token count crosses a budget boundary (the next event starts a
new chunk) or the inactivity gap starts a new session. Closed samples are
byte-identical to the batch plan's rows for the same prefix of events
(asserted in tests); the still-open chunk stays in the state store and
survives restarts, so a resumed feed continues exactly where it left off.

Ordering caveat (same as every stream sessionizer, incl. stateful.py):
the boundary rule is sequential in event time, so per-entity arrival must
be in (ts, tiebreak) order ACROSS micro-batches (within a batch we sort);
an upstream watermark-ordered stage provides that in production. The
caveat is ENFORCED, not just documented (VERDICT r5 #8): an event whose
timestamp precedes the entity's last folded event (cross-batch disorder)
is folded deterministically in ARRIVAL order — it joins the open chunk,
it can never retro-open a closed sample — and is counted in the emitted
sample's ``n_disorder`` lineage column, so a feed with a broken upstream
ordering contract is loudly visible in the output instead of silently
producing boundary-shifted samples. At 100TB the state is per-entity and
budget-bounded — it scales with executors via the state store, never
with history length.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from docext_spark.core.textstats import token_count

SEP = "\n"

STATE_SCHEMA = T.StructType([
    T.StructField("session_idx", T.LongType()),
    T.StructField("chunk_idx", T.LongType()),
    T.StructField("session_toks", T.LongType()),   # tokens before open chunk's end
    T.StructField("last_us", T.LongType()),
    T.StructField("n_events", T.LongType()),       # open chunk
    T.StructField("chunk_toks", T.LongType()),
    T.StructField("start_us", T.LongType()),
    T.StructField("end_us", T.LongType()),
    T.StructField("text_buf", T.StringType()),
    T.StructField("n_disorder", T.LongType()),     # open chunk's OOO count
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("entity", T.StringType()),
    T.StructField("session_idx", T.LongType()),
    T.StructField("session_id", T.StringType()),
    T.StructField("chunk_idx", T.LongType()),
    T.StructField("sample_id", T.StringType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("n_tokens", T.LongType()),
    T.StructField("sample_start_us", T.LongType()),
    T.StructField("sample_end_us", T.LongType()),
    T.StructField("sample_text", T.StringType()),
    # events in this sample that arrived AFTER a later-ts event had already
    # been folded (cross-micro-batch disorder) — 0 on a well-ordered feed
    T.StructField("n_disorder", T.LongType()),
])


def make_emitter(gap_minutes: float, budget_tokens: int):
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def emit(key: tuple, batches: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        (entity,) = key
        if state.exists:
            vals = state.get
            (session_idx, chunk_idx, session_toks, last_us,
             n_events, chunk_toks, start_us, end_us, text_buf) = vals[:9]
            # legacy 9-field state (pre-n_disorder checkpoints) — tolerate
            # if the engine's schema check was relaxed; see the migration
            # note on run_training_stream
            n_disorder = vals[9] if len(vals) > 9 else 0
        else:
            session_idx = 0          # no session open yet
            chunk_idx = session_toks = n_events = chunk_toks = 0
            last_us = start_us = end_us = -1
            text_buf = ""
            n_disorder = 0
        out = []

        def close_chunk():
            out.append({
                "entity": entity, "session_idx": session_idx,
                "session_id": f"{entity}#{session_idx}",
                "chunk_idx": chunk_idx,
                "sample_id": f"{entity}#{session_idx}/{chunk_idx}",
                "n_events": n_events, "n_tokens": chunk_toks,
                "sample_start_us": start_us, "sample_end_us": end_us,
                "sample_text": text_buf, "n_disorder": n_disorder})

        # ONE sort over the group's whole micro-batch: the iterator yields
        # Arrow chunks (default 10k rows), and sorting each chunk
        # independently would fold a large entity's events out of order
        # (code-review r5: reproduced wrong sample membership at
        # maxRecordsPerBatch=2). Memory is the entity's per-batch volume —
        # the same bound the fold itself already implies.
        pdfs = list(batches)
        merged = (pd.concat(pdfs) if pdfs else
                  pd.DataFrame(columns=["ts", "tb", "text"]))
        merged = merged.sort_values(["ts", "tb"], kind="mergesort")
        for ts, text in zip(merged["ts"], merged["text"]):
            ev_us = int(pd.Timestamp(ts).value // 1000)
            toks = token_count(text or "")
            # cross-micro-batch disorder: a later-ts event was already
            # folded (within a batch the sort makes this impossible).
            # Deterministic correction: fold in arrival order into the
            # OPEN chunk, count it — never retro-open a closed sample.
            disorder = last_us >= 0 and ev_us < last_us
            new_session = session_idx == 0 \
                or (ev_us - last_us) > gap_us
            if new_session:
                if n_events:
                    close_chunk()
                session_idx += 1
                chunk_idx = session_toks = 0
                n_events = chunk_toks = 0
                text_buf = ""
                n_disorder = 0
            else:
                ev_chunk = session_toks // budget_tokens
                if ev_chunk > chunk_idx:
                    if n_events:
                        close_chunk()
                    chunk_idx = ev_chunk
                    n_events = chunk_toks = 0
                    text_buf = ""
                    n_disorder = 0
            # min/max bounds (not first/last folded): one disorder event
            # must not leave the sample's [start, end] extent excluding an
            # event its text contains (code-review r6)
            start_us = min(start_us, ev_us) if n_events else ev_us
            text_buf = (text_buf + SEP + (text or "")) if n_events \
                else (text or "")
            n_events += 1
            chunk_toks += toks
            session_toks += toks
            n_disorder += int(disorder)
            end_us = max(end_us, ev_us) if n_events > 1 else ev_us
            last_us = max(last_us, ev_us)
        state.update((session_idx, chunk_idx, session_toks, last_us,
                      n_events, chunk_toks, start_us, end_us, text_buf,
                      n_disorder))
        if out:
            yield pd.DataFrame(out)

    return emit


def run_training_stream(spark: SparkSession, input_dir: str, schema,
                        checkpoint_dir: str, output_dir: str,
                        entity_col: str = "user_id",
                        ts_col: str = "ts",
                        text_col: str = "text",
                        tiebreak_col: str = "event_id",
                        gap_minutes: float = 30.0,
                        budget_tokens: int = 512) -> DataFrame:
    """availableNow run: events landing as parquet → CLOSED training
    samples appended to ``output_dir`` through the NATIVE parquet file
    sink — its ``_spark_metadata`` transaction log commits each batch
    idempotently (the extract_stream recipe), so a crash between writing
    files and committing offsets replays WITHOUT duplicating samples; a
    foreachBatch blind-append would be at-least-once. The sink also
    creates the output path at stream start, so a cold run over an empty
    input directory returns an empty frame instead of raising.
    Re-running with the same checkpoint resumes the per-entity
    open-chunk state.

    Column names and ``budget_tokens=512`` default mirror the batch twin
    ``plans.training.sessions_to_training_samples`` (ADVICE r5: the two
    'twin' paths must not produce different sample boundaries from their
    defaults); the tiebreak is required here — stream arrival order at
    equal timestamps is nondeterministic, so ties must break on data.

    MIGRATION (state schema v2): adding ``n_disorder`` widened
    STATE_SCHEMA, and Spark's state-store schema check rejects a resume
    from a pre-v2 checkpoint at stream start (loud, not corrupting).
    Upgrading a live feed means a fresh checkpoint_dir AND a fresh
    output_dir (the parquet sink's transaction log is per-checkpoint, so
    reprocessing into the old output would duplicate closed samples)."""
    stream = (spark.readStream.schema(schema).parquet(input_dir)
              .select(F.col(entity_col).cast("string").alias("entity"),
                      F.col(ts_col).alias("ts"),
                      F.col(tiebreak_col).alias("tb"),
                      F.col(text_col).alias("text")))
    emitted = (stream.groupBy("entity")
               .applyInPandasWithState(
                   make_emitter(gap_minutes, budget_tokens),
                   OUTPUT_SCHEMA, STATE_SCHEMA, "append",
                   GroupStateTimeout.NoTimeout))
    q = (emitted.writeStream.format("parquet")
         .option("path", output_dir)
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.schema(OUTPUT_SCHEMA).parquet(output_dir)

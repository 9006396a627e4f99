"""Benchmark decontamination (operators/decontam.py): n-gram overlap
between a training corpus and a broadcast eval set."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docext_spark.operators.decontam import (contamination_pairs,
                                             contamination_report,
                                             decontaminate,
                                             eval_ngram_table)

EVAL = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 0: contains the eval text verbatim (plus padding) → all 3 of
        #    the eval's 8-grams hit
        (0, "prefix words here " + EVAL + " and trailing filler tokens"),
        # 1: shares exactly the FIRST eval 8-gram, then diverges
        (1, "the quick brown fox jumps over the lazy cat sat on a mat "
            "for a very long time indeed"),
        # 2: clean — same vocabulary, never 8 tokens in eval order
        (2, "dog lazy the over jumps fox brown quick the tonight and "
            "some extra clean padding words"),
        # 3: shorter than 8 tokens → whole-text shingle, no match
        (3, "quick brown fox jumps over"),
        # 4: empty text → no shingles at all
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def eval_df(spark):
    return spark.createDataFrame([(100, EVAL)],
                                 "eval_id long, text string").cache()


def test_eval_ngram_table(eval_df):
    rows = eval_ngram_table(eval_df, n=8).collect()
    # 10 tokens → 3 distinct 8-grams, each from eval 100 only
    assert len(rows) == 3
    assert all(r["n_eval_ids"] == 1 and r["min_eval_id"] == 100
               for r in rows)


def test_report_hits_and_fractions(corpus, eval_df):
    rep = {r["doc_id"]: r for r in
           contamination_report(corpus, eval_df, n=8).collect()}
    assert set(rep) == {0, 1}                      # 2-4 are clean
    assert rep[0]["n_hit"] == 3                    # verbatim inclusion
    assert rep[1]["n_hit"] == 1                    # single shared 8-gram
    for r in rep.values():
        assert r["contaminated"] is True
        assert r["first_eval_id"] == 100
        assert 0 < r["overlap_frac"] <= 1
        assert r["n_hit"] <= r["n_ngrams"]


def test_min_hits_threshold(corpus, eval_df):
    rep = {r["doc_id"] for r in
           contamination_report(corpus, eval_df, n=8, min_hits=2).collect()}
    assert rep == {0}                              # doc 1 has only 1 hit


def test_pairs_attribution(corpus, eval_df):
    pairs = {(r["doc_id"], r["eval_id"]): r["n_shared"] for r in
             contamination_pairs(corpus, eval_df, n=8).collect()}
    assert pairs == {(0, 100): 3, (1, 100): 1}


def test_decontaminate_removes_exactly_the_hits(corpus, eval_df):
    kept = sorted(r["doc_id"] for r in
                  decontaminate(corpus, eval_df, n=8).collect())
    assert kept == [2, 3, 4]


def test_short_eval_whole_text_rule(spark, corpus):
    # eval shorter than n → its whole text is the single shingle; it only
    # matches a corpus doc whose own shingle set contains that exact
    # string (doc 3 is the whole-text twin, doc 1 merely contains the
    # words inside a longer text and its 8-gram shingles never equal it)
    ev = spark.createDataFrame([(7, "quick brown fox jumps over")],
                               "eval_id long, text string")
    rep = {r["doc_id"] for r in
           contamination_report(corpus, ev, n=8).collect()}
    assert rep == {3}


def test_empty_eval_set(spark, corpus):
    ev = spark.createDataFrame([], "eval_id long, text string")
    assert contamination_report(corpus, ev, n=8).count() == 0
    assert decontaminate(corpus, ev, n=8).count() == corpus.count()


def test_broadcast_no_corpus_shuffle_for_join(corpus, eval_df):
    plan = (contamination_report(corpus, eval_df, n=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

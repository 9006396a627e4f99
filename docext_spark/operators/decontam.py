"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation set (the GPT-3 Appendix C / PaLM "contamination"
check — flag any training document sharing at least ``min_hits`` word
n-grams with any eval example; n=8..13 is the published range, default 8).

No reference counterpart exists (docext is a single-document tool); this
is part of the training-data-pipeline surface the engine adds.

Distributed-first shape, sized for the real asymmetry of the problem:
the eval set is config-scale (a benchmark: 10^3..10^5 short examples)
while the training corpus is the 100 TB side. So:

  * the eval n-gram table is aggregated per-shingle eval-side (tiny) and
    BROADCAST — the corpus is never shuffled to meet it;
  * corpus shingles are generated map-side (array_distinct before the
    explode, identical to dedup.shingle_table — no shuffle);
  * the single shuffle is the per-document groupBy that folds hit counts,
    i.e. the minimum any per-document statistic needs;
  * the cleanup filter is a broadcast anti-join on the contaminated-id
    set, which is again small (it is bounded by the corpus rows that hit
    the eval set, not by the corpus).

Contamination statistics are integer counts and a single int/int
division — no order-dependent floating sums, so parity hashes are
deterministic (VERDICT r5 #1 class).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docext_spark.operators.dedup import shingle_table


def eval_ngram_table(eval_df: DataFrame, id_col: str = "eval_id",
                     text_col: str = "text", n: int = 8) -> DataFrame:
    """(shingle, n_eval_ids, min_eval_id) aggregated over the eval set.

    Aggregating per-shingle BEFORE the broadcast keeps the broadcast rows
    bounded by distinct eval n-grams and lets the per-document stats join
    stay 1:1 (a raw (eval_id, shingle) join would multiply corpus rows by
    the number of eval examples sharing a shingle)."""
    sh = shingle_table(eval_df, id_col, text_col, n=n)
    return (sh.groupBy("shingle")
              .agg(F.count(F.lit(1)).alias("n_eval_ids"),
                   F.min("id").alias("min_eval_id")))


def contamination_report(docs: DataFrame, eval_df: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         eval_id_col: str = "eval_id",
                         eval_text_col: str = "text",
                         n: int = 8, min_hits: int = 1) -> DataFrame:
    """Per contaminated training document: how many of its distinct word
    ``n``-grams appear anywhere in the eval set.

    Returns (doc_id, n_ngrams, n_hit, overlap_frac, first_eval_id,
    contaminated) for documents with ``n_hit >= min_hits``. ``n_ngrams``
    counts the document's distinct shingles (texts shorter than ``n``
    tokens contribute their whole text as one shingle, matching
    dedup.shingle_table), ``overlap_frac = n_hit / n_ngrams``, and
    ``first_eval_id`` is the smallest eval id among the document's hit
    shingles' own smallest eval ids — a deterministic attribution anchor
    (full attribution: contamination_pairs).

    Plan: corpus shingles map-side → LEFT broadcast join on shingle →
    one groupBy(doc). The left join keeps every corpus shingle so
    ``n_ngrams`` comes from the same pass — no second corpus scan."""
    doc_sh = shingle_table(docs, id_col, text_col, n=n)
    ev = F.broadcast(eval_ngram_table(eval_df, eval_id_col,
                                      eval_text_col, n=n))
    joined = doc_sh.join(ev, "shingle", "left")
    hit = F.col("n_eval_ids").isNotNull()
    return (joined.groupBy(F.col("id").alias("doc_id"))
            .agg(F.count(F.lit(1)).alias("n_ngrams"),
                 F.count(F.when(hit, 1)).alias("n_hit"),
                 F.min("min_eval_id").alias("first_eval_id"))
            .filter(F.col("n_hit") >= min_hits)
            .select("doc_id", "n_ngrams", "n_hit",
                    F.round(F.col("n_hit") / F.col("n_ngrams"), 6)
                     .alias("overlap_frac"),
                    "first_eval_id",
                    F.lit(True).alias("contaminated")))


def contamination_pairs(docs: DataFrame, eval_df: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        eval_id_col: str = "eval_id",
                        eval_text_col: str = "text",
                        n: int = 8) -> DataFrame:
    """Full attribution: (doc_id, eval_id, n_shared) — which eval example
    leaked into which training document, with the shared-n-gram count.

    Uses the raw (eval_id, shingle) table (still broadcast-small) and an
    INNER broadcast join, so only hit rows materialize; the groupBy is on
    (doc, eval) — output is bounded by actual contamination, not the
    corpus."""
    doc_sh = shingle_table(docs, id_col, text_col, n=n)
    ev_sh = F.broadcast(
        shingle_table(eval_df, eval_id_col, eval_text_col, n=n)
        .withColumnRenamed("id", "eval_id"))
    return (doc_sh.join(ev_sh, "shingle")
            .groupBy(F.col("id").alias("doc_id"), "eval_id")
            .agg(F.count(F.lit(1)).alias("n_shared")))


def decontaminate(docs: DataFrame, eval_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  eval_id_col: str = "eval_id",
                  eval_text_col: str = "text",
                  n: int = 8, min_hits: int = 1) -> DataFrame:
    """The cleanup filter: training docs with every contaminated row
    removed. Broadcast anti-join on the contaminated-id set (bounded by
    hits, not by the corpus) — the corpus itself is never shuffled."""
    bad = contamination_report(docs, eval_df, id_col, text_col,
                               eval_id_col, eval_text_col,
                               n=n, min_hits=min_hits).select("doc_id")
    return docs.join(F.broadcast(bad),
                     docs[id_col] == bad["doc_id"], "left_anti")

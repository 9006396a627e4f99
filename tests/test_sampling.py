"""Content-addressed sampling/splitting/mixing (operators/sampling.py)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docext_spark.operators.sampling import (hash_unit, mixture,
                                             sample_fraction,
                                             sample_to_token_budget,
                                             split_by_hash)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"document number {i} with exactly seven tokens")
            for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.mark.parametrize("engine", ["xxhash64", "sha256"])
def test_sample_fraction_deterministic_and_nested(docs, engine):
    a1 = {r["doc_id"] for r in
          sample_fraction(docs, 0.2, engine=engine).collect()}
    a2 = {r["doc_id"] for r in
          sample_fraction(docs, 0.2, engine=engine).collect()}
    assert a1 == a2 and 250 < len(a1) < 550        # stable, ~20%
    bigger = {r["doc_id"] for r in
              sample_fraction(docs, 0.5, engine=engine).collect()}
    assert a1 <= bigger                            # samples NEST
    other_seed = {r["doc_id"] for r in
                  sample_fraction(docs, 0.2, seed=9, engine=engine).collect()}
    assert other_seed != a1                        # seed changes the draw


def test_split_disjoint_exhaustive(docs):
    train, val = split_by_hash(docs, val_frac=0.25)
    t = {r["doc_id"] for r in train.collect()}
    v = {r["doc_id"] for r in val.collect()}
    assert not (t & v)
    assert len(t) + len(v) == 2000
    assert 350 < len(v) < 650


def test_token_budget_sampling(docs):
    # 2000 docs x 7 tokens = 14000 total; budget 3500 → ~25% of docs
    sel = sample_to_token_budget(docs, 3500)
    n = sel.count()
    assert 300 < n < 700
    # budget >= total returns everything untouched
    assert sample_to_token_budget(docs, 10**9).count() == 2000


def test_mixture_weights_and_provenance(spark, docs):
    a = docs.filter(F.col("doc_id") < 1000)
    b = docs.filter(F.col("doc_id") >= 1000)
    mixed = mixture({"alpha": (a, 1.0), "beta": (b, 0.3)})
    counts = {r["mix_source"]: r["n"] for r in
              mixed.groupBy("mix_source").agg(F.count(F.lit(1)).alias("n"))
                   .collect()}
    assert counts["alpha"] == 1000                 # fraction 1.0 keeps all
    assert 150 < counts["beta"] < 450              # ~30%
    with pytest.raises(ValueError):
        mixture({})


def test_hash_unit_in_range(docs):
    for engine in ("xxhash64", "sha256"):
        row = docs.select(
            F.min(hash_unit(F.col("doc_id"), engine=engine)).alias("lo"),
            F.max(hash_unit(F.col("doc_id"), engine=engine)).alias("hi")
        ).collect()[0]
        assert 0.0 <= row["lo"] and row["hi"] < 1.0


def test_mixture_selection_invariant_to_other_sources(spark, docs):
    """Code-review regression: per-source seeds derive from the source
    NAME, so adding a corpus to the mix must not reshuffle any existing
    source's sampled set (cross-run leakage audits depend on it)."""
    a = docs.filter(F.col("doc_id") < 1000)
    b = docs.filter(F.col("doc_id") >= 1000)
    only_a = {r["doc_id"] for r in
              mixture({"alpha": (a, 0.4)}).collect()}
    with_b = {r["doc_id"] for r in
              mixture({"alpha": (a, 0.4), "beta": (b, 0.5)})
              .filter(F.col("mix_source") == "alpha").collect()}
    assert only_a == with_b


def test_sample_fraction_one_keeps_everything(docs):
    """u must be strictly < 1.0 so fraction 1.0 means keep-all (a raw
    64-bit double cast can round to exactly 1.0 for hashes near 2^63)."""
    for engine in ("xxhash64", "sha256"):
        assert sample_fraction(docs, 1.0, engine=engine).count() == 2000

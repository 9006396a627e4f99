"""Deterministic sampling / splitting / mixing for training-corpus
assembly — the last mile after curation: pick WHAT goes into a run.

Everything here is content-addressed (seeded xxhash64 of the id), never
RNG-state-dependent: the same document lands on the same side of every
split on every run, on any cluster size, under any partitioning — the
property that makes train/val splits reproducible and leakage-auditable
at 100TB. All map-only native expressions except the one aggregate that
measures corpus size for budget targeting.

The reference has no sampling surface (single-document tool); this is
part of the beyond-parity training-data family (SURVEY §2 extras).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX13 = float(1 << 52)  # 13 hex digits = 52 bits, exactly double-precise


def hash_unit(col, seed: int = 0, engine: str = "xxhash64"):
    """Deterministic uniform-ish u ∈ [0, 1) from a column value. The same
    (value, seed) always yields the same u — sampling by `u < p` is a
    content-addressed Bernoulli draw. Corollary the caller must own: rows
    sharing an id (duplicates, or all-NULL ids) share ONE draw — they land
    entirely in or entirely out. That is the point for dedup-stable
    sampling; it means ids should be unique and non-null.

    engine='xxhash64' (production): native seeded XXH64, top 52 bits
    shifted into the unit interval (52 bits are exactly double-precise, so
    u < 1.0 strictly — a raw 64-bit cast rounds values near 2^63 UP and
    can emit exactly 1.0, which would drop rows at fraction 1.0).
    engine='sha256' (oracle): 13 hex chars (52 bits) of
    sha256('{seed}|{value}'), NULL value hashed as '' — replayable
    verbatim in DuckDB via coalesce, same dual-engine pattern as
    minhash_component."""
    if engine == "xxhash64":
        h = F.shiftright(F.xxhash64(F.lit(seed), col), 12)  # 52 exact bits
        return (h.cast("double") + _HEX13 / 2) / _HEX13
    if engine != "sha256":
        raise ValueError(f"unknown hash_unit engine: {engine!r}")
    # concat (not concat_ws): concat_ws silently DROPS null inputs, giving
    # '0' where the SQL twin's '0|' || coalesce(id, '') gives '0|'
    digest = F.sha2(F.concat(F.lit(f"{seed}|"),
                             F.coalesce(col.cast("string"), F.lit(""))), 256)
    return F.conv(F.substring(digest, 1, 13), 16, 10).cast("double") / _HEX13


def sample_fraction(df: DataFrame, p: float, id_col: str = "doc_id",
                    seed: int = 0, engine: str = "xxhash64") -> DataFrame:
    """Keep a deterministic p-fraction by id hash. Unlike df.sample(),
    membership is a pure function of (id, seed): stable across reruns,
    repartitions, and cluster sizes, and two samples with the same seed
    NEST (p1 ⊂ p2 when p1 ≤ p2) — so growing a subsample never churns
    the previously selected set."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {p}")
    return df.filter(hash_unit(F.col(id_col), seed, engine) < p)


def split_by_hash(df: DataFrame, val_frac: float = 0.01,
                  id_col: str = "doc_id", seed: int = 0,
                  engine: str = "xxhash64") -> tuple[DataFrame, DataFrame]:
    """(train, val) with disjoint, exhaustive, content-addressed
    membership — one hash evaluation decides both sides, so no document
    can leak across the boundary between runs."""
    if not 0.0 <= val_frac <= 1.0:
        raise ValueError(f"val_frac must be in [0,1], got {val_frac} "
                         "(a fraction, not a percentage)")
    u = hash_unit(F.col(id_col), seed, engine)
    return df.filter(u >= val_frac), df.filter(u < val_frac)


def sample_to_token_budget(df: DataFrame, budget_tokens: int,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           seed: int = 0,
                           engine: str = "xxhash64") -> DataFrame:
    """Approximately ``budget_tokens`` worth of documents, chosen by the
    content-addressed fraction budget/total. Two passes: one aggregate to
    measure the corpus (map-side partial sum, one scalar to the driver),
    then a map-only hash filter — NO global sort / running-total window
    (an exact running-total cut is a single-partition window over the
    whole corpus, which at 100TB funnels everything through one task;
    the fraction form is the scale-safe shape, accurate to sampling noise
    ~1/sqrt(n_docs)). Fully LAZY: the total rides along as a broadcast
    scalar inside the plan, so building the DataFrame triggers no job
    (every queries() entry is a side-effect-free plan builder)."""
    from docext_spark.operators.textops import token_count
    # collision-proof scalar column name: if the caller's frame already had
    # a column of the same name, the filter below would be ambiguous and
    # fail analysis with an opaque error (ADVICE r3)
    tot = "_total_tokens"
    while tot in df.columns:
        tot = "_" + tot
    total_df = df.agg(F.coalesce(F.sum(token_count(F.col(text_col))),
                                 F.lit(0)).alias(tot))
    u = hash_unit(F.col(id_col), seed, engine)
    keep = ((F.col(tot) <= budget_tokens)
            | (u < F.lit(float(budget_tokens)) / F.col(tot)))
    return (df.crossJoin(F.broadcast(total_df))
            .filter(keep)
            .drop(tot))


def source_seed(name: str, seed: int = 0) -> int:
    """Per-source draw seed derived from the source NAME (stable 32-bit
    sha256 prefix), never from its position: adding, removing, or renaming
    one source must not reshuffle any OTHER source's sampled set — the
    rerun-stability/leakage-audit property the module exists for."""
    import hashlib
    return seed + int(hashlib.sha256(name.encode()).hexdigest()[:8], 16)


def mixture(sources: dict[str, tuple[DataFrame, float]],
            id_col: str = "doc_id", seed: int = 0,
            engine: str = "xxhash64") -> DataFrame:
    """Weighted corpus mixture: for each named source, keep the given
    fraction (content-addressed, name-derived per-source seed so the same
    id appearing in two corpora draws independently AND each source's
    selection is invariant to what other sources are in the mix), tag
    provenance, and union. weights are FRACTIONS of each source (0..1],
    not relative ratios — callers that want ratio semantics normalize
    first."""
    out = None
    for name, (df, frac) in sorted(sources.items()):
        part = (sample_fraction(df, frac, id_col, source_seed(name, seed),
                                engine)
                .withColumn("mix_source", F.lit(name)))
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("mixture() needs at least one source")
    return out

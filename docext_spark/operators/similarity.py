"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline (native higher-order
functions — zip_with dot product, aggregate norms; JVM-side, no Python), and
an LSH-bucketed variant (random-hyperplane signs) as the 100TB scale path:
buckets shrink the candidate set from |corpus| to |bucket|, the final exact
re-rank runs only inside buckets.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "qid", qvec_col: str = "qvec") -> DataFrame:
    """Exact cosine top-k per query. The (small) query side is broadcast —
    the corpus streams through one map stage, then a per-query top-k window.

    Returns (qid, vec_id, cos_sim, rank), rank 1..k, ties broken by vec_id
    (deterministic)."""
    scored = (vectors.crossJoin(F.broadcast(queries))
              .select(F.col(qid_col), F.col(id_col),
                      F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6)
                       .alias("cos_sim")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def embedding_near_dups(vectors: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        exact: bool = True, n_planes: int = 6,
                        dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos_sim ≥ τ).

    exact=True: full self-join — the correctness baseline (oracle-checked).
    exact=False: hyperplane-LSH bucketed join — candidates only materialize
    inside shared buckets (the 100TB path; collision prob for cosine≥τ pairs
    is (1 - acos(τ)/π)^n_planes per table)."""
    v = vectors.select(F.col(id_col).alias("id"),
                       F.col(vec_col).cast("array<double>").alias("vec"))
    if not exact:
        planes = deterministic_planes(dim or 8, n_planes)
        v = v.withColumn("bucket", hyperplane_signature(F.col("vec"), planes))
        join_on = ["bucket"]
    else:
        v = v.withColumn("bucket", F.lit(0))
        join_on = ["bucket"]
    a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket")
    b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket")
    return (a.join(b, join_on)
             .filter(F.col("id_a") < F.col("id_b"))
             .withColumn("cos_sim",
                         F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
             .filter(F.col("cos_sim") >= threshold)
             .select("id_a", "id_b", "cos_sim").distinct())


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one sign bit per plane, packed into
    a string key ('1'/'0' chars). Planes are a fixed seeded constant —
    broadcast-free (inlined in the plan)."""
    bits = [F.when(dot(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0,
                   F.lit("1")).otherwise(F.lit("0"))
            for p in planes]
    return F.concat(*bits)


def deterministic_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes (pure Python, reproducible)."""
    import random
    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def ivf_assign(vectors: DataFrame, centroids: list[tuple[int, list[float]]],
               vec_col: str = "embedding", probe: int = 1) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest
    centroid(s). Centroids are a small seeded constant (inlined literals —
    at real scale, a broadcast k-means result). probe>1 assigns each vector
    to its `probe` nearest lists for higher recall."""
    dists = F.array(*[
        F.struct(
            (-cosine(F.col(vec_col),
                     F.array(*[F.lit(float(x)) for x in cvec]))).alias("negsim"),
            F.lit(cid).alias("cid"))
        for cid, cvec in centroids])
    nearest = F.slice(F.array_sort(dists), 1, probe)
    return vectors.withColumn("ivf_list",
                              F.explode(F.transform(nearest, lambda s: s["cid"])))


def deterministic_centroids(vectors: DataFrame, n_lists: int = 8,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Seeded centroid pick: the n_lists lowest-id vectors (deterministic
    stand-in for a k-means fit; on a cluster, fit with Spark ML KMeans)."""
    rows = (vectors.orderBy(id_col).limit(n_lists)
            .select(vec_col).collect())
    return [(i, list(r[0])) for i, r in enumerate(rows)]


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             n_lists: int = 8, probe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding", qid_col: str = "qid",
             qvec_col: str = "qvec") -> DataFrame:
    """IVF approximate top-k: corpus bucketed into inverted lists by nearest
    centroid; a query scans only its `probe` nearest lists. At 100TB the
    corpus is written bucketed by ivf_list so a query prunes to
    probe/n_lists of the data."""
    cents = deterministic_centroids(vectors, n_lists, id_col, vec_col)
    v = ivf_assign(vectors, cents, vec_col, probe=1)
    q = ivf_assign(queries.withColumnRenamed(qvec_col, "_qv"), cents,
                   "_qv", probe=probe).withColumnRenamed("_qv", qvec_col)
    scored = (v.join(F.broadcast(q), "ivf_list")
              .select(F.col(qid_col), F.col(id_col),
                      F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6)
                       .alias("cos_sim")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def lsh_topk(vectors: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             n_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", qid_col: str = "qid",
             qvec_col: str = "qvec") -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket,
    exact cosine re-rank inside the bucket. Recall grows with fewer planes;
    at scale use multiple tables (union of plane sets)."""
    planes = deterministic_planes(dim, n_planes)
    v = vectors.withColumn("bucket", hyperplane_signature(F.col(vec_col), planes))
    q = queries.withColumn("bucket", hyperplane_signature(F.col(qvec_col), planes))
    scored = (v.join(F.broadcast(q), "bucket")
              .select(F.col(qid_col), F.col(id_col),
                      F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6)
                       .alias("cos_sim")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))

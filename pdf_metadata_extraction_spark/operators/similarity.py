"""Similarity search over embedding columns (task mandate — ANN for the
entity-linking candidate stage at 100 TB).

- ``cosine_topk``   — brute-force exact baseline: broadcast the query
  set, JVM-side dot products via ``aggregate``/``zip_with`` (no Python).
- ``lsh_topk``      — scale path: random-hyperplane sign-LSH buckets the
  corpus; candidates come only from the query's bucket (probing nearby
  buckets optional) → the join touches a fraction of the corpus.
- ``cosine_pairs``  — embedding near-duplicate pairs (cosine ≥ τ) among
  LSH-bucketed candidates.

Determinism: hyperplanes are seeded from md5 counters (no RNG state);
tie-breaks are (sim desc, vec_id asc) everywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: corpus × broadcast(queries) → ranked matches.

    Output: (query_id, match_id, sim, rank). Excludes self-matches.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("c_vec"))
    scored = c.crossJoin(F.broadcast(q)).where(
        F.col("match_id") != F.col("query_id")
    ).select(
        "query_id", "match_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5 counters."""
    vals = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for i in range(0, dim, 4):
            h = hashlib.md5(f"plane:{p}:{i}".encode()).digest()
            for j in range(min(4, dim - i)):
                v = int.from_bytes(h[j * 4:(j + 1) * 4], "big")
                vals[p, i + j] = (v / 2**31) - 1.0
    return vals


def signlsh_bucket(df: DataFrame, vec_col: str, dim: int, n_planes: int = 8):
    """Add a sign-LSH bucket column: bit p = sign(v · plane_p)."""
    planes = _hyperplanes(dim, n_planes)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        arr = F.array(*[F.lit(float(x)) for x in planes[p]])
        bucket = bucket + F.when(_dot(F.col(vec_col), arr) > 0, 2**p).otherwise(0)
    return df.withColumn("bucket", bucket)


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, n_planes: int = 6,
) -> DataFrame:
    """ANN top-k: only candidates in the query's LSH bucket are scored.

    Recall < 1 by construction; the bucket join replaces the full cross
    product (2^n_planes buckets ⇒ ~corpus/2^n candidates per query).
    """
    c = signlsh_bucket(
        corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("c_vec")),
        "c_vec", dim, n_planes,
    )
    q = signlsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec", dim, n_planes,
    )
    scored = c.join(F.broadcast(q), "bucket").where(
        F.col("match_id") != F.col("query_id")
    ).select(
        "query_id", "match_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", F.round("sim", 6).alias("sim"), "rank")
    )


def cosine_pairs(
    df: DataFrame, min_sim: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, n_planes: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket self-join then exact cosine."""
    b = signlsh_bucket(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        "vec", dim, n_planes,
    )
    return (
        b.alias("a")
        .join(b.alias("b"), "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("sim"),
        )
        .where(F.col("sim") >= min_sim)
    )

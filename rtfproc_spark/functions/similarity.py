"""Similarity search over embedding columns (array<float>).

- ``cosine_sim``: native zip_with/aggregate dot product — JVM-side.
- ``brute_force_topk``: baseline exact top-k vs one query vector
  (broadcast literal; single scan, no shuffle until the final top-k).
- ``lsh_bucket_topk``: random-hyperplane LSH variant — candidates share a
  sign-bucket with the query, so the scan prunes to ~n/2^bits rows before
  scoring; the scale path when n is billions.
- ``all_pairs_near`` : embedding-cosine near-duplicate pairs via the same
  LSH bucketing (self-join on bucket, then exact verify).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _vec_lit(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_sim(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / F.greatest(na * nb, F.lit(1e-12))


def brute_force_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = _vec_lit(query_vec)
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), q)
    return (
        df.select(F.col(id_col), F.round(sim, 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim)


def lsh_bucket_expr(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-bucket id: bit i = (v . plane_i) >= 0. Native dot products."""
    bucket = F.lit(0).cast("long")
    v = F.col(vec_col).cast("array<double>")
    for i, plane in enumerate(planes):
        dot = cosine_sim(v, _vec_lit(plane / np.linalg.norm(plane)))
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's sign bucket.

    At 100 TB the bucket filter is a pushable int equality after the bucket
    column is materialized at ingest (partition or Z-order by bucket)."""
    q = np.asarray(query_vec, dtype=float)
    planes = _hyperplanes(len(q), bits, seed)
    qbucket = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(q, p)) >= 0))
    bucketed = df.withColumn("_bucket", lsh_bucket_expr(vec_col, planes))
    return brute_force_topk(
        bucketed.filter(F.col("_bucket") == qbucket), q, k, vec_col, id_col
    )


def all_pairs_near(
    df: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucket self-join."""
    dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, seed)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        lsh_bucket_expr(vec_col, planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id"))
    )
    sim = cosine_sim(F.col("l.v"), F.col("r.v"))
    return pairs.select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        F.round(sim, 4).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)

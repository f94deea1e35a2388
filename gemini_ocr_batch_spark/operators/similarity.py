"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k. The dot product / norms are
  built-in higher-order functions (F.aggregate / F.zip_with) — JVM-side,
  whole-stage-codegen'd, no Python. At scale this is one pass + a top-k
  (TakeOrderedAndProject), embarrassingly parallel.

- ``lsh_topk``: random-hyperplane (sign) LSH. Hyperplanes are a tiny
  deterministic seeded matrix broadcast as a literal column; bucket =
  bit-packed signs. Probing searches only the query's bucket (optionally
  multi-probe by Hamming-1 neighbors) — the scale path when one pass over
  10^12 vectors is too much.

- ``embedding_near_dup_pairs``: all-pairs cosine ≥ τ within LSH buckets —
  the embedding-cosine near-dup dedup path.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.operators.util import spread_small_input


def _dot(a, b):  # Column helpers
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a, b):
    return (_dot(a, b) / (_norm(a) * _norm(b))).alias("cosine")


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector.

    Returns (id, rank, cosine) — deterministic tie-break by id.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = spread_small_input(embeddings).select(
        F.col(id_col),
        cosine_col(F.col(vec_col).cast("array<double>"), q),
    )
    # TakeOrderedAndProject (per-partition top-k, merged) — a global
    # un-partitioned row_number window would sort ALL rows in one task
    top = scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.col(id_col))  # over k rows only
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(id_col, "rank", "cosine")
        .orderBy("rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    """Deterministic seeded Gaussian hyperplanes (public LSH construction:
    Charikar, STOC 2002 — sign-random-projection)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Bit-packed sign bucket for a vector column (bigint)."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(vec_col, p) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit.cast("bigint"), i)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's sign bucket.

    At scale, write the table partitioned by bucket → partition pruning
    makes this a metadata-bounded scan instead of a full pass.
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    vec_d = F.col(vec_col).cast("array<double>")
    with_bucket = spread_small_input(embeddings).select(
        F.col(id_col), vec_d.alias("v"), lsh_bucket_col(vec_d, planes).alias("bucket")
    )
    # driver-side: the query's bucket (pure python, same construction)
    qb = 0
    for i, plane in enumerate(planes):
        d = sum(a * b for a, b in zip(query_vec, plane))
        qb |= (1 if d >= 0 else 0) << i
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = (
        with_bucket.filter(F.col("bucket") == qb)
        .select(F.col(id_col), cosine_col(F.col("v"), q))
    )
    # TakeOrderedAndProject (per-partition top-k, merged) — a global
    # un-partitioned row_number window would sort ALL rows in one task
    top = scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.col(id_col))  # over k rows only
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(id_col, "rank", "cosine")
        .orderBy("rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, candidate-bounded by
    shared LSH bucket (vectors at cosine ~1 collide in all sign bits with
    high probability)."""
    first = embeddings.select(vec_col).first()
    dim = len(first[0]) if first else 0
    planes = hyperplanes(dim, n_planes, seed)
    vec_d = F.col(vec_col).cast("array<double>")
    with_bucket = spread_small_input(embeddings).select(
        F.col(id_col).alias("id"),
        vec_d.alias("v"),
        lsh_bucket_col(vec_d, planes).alias("bucket"),
    )
    a, b = with_bucket.alias("a"), with_bucket.alias("b")
    return (
        a.join(b, on="bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_col(F.col("a.v"), F.col("b.v")),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )

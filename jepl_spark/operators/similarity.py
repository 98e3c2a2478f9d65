"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline (vectorized JVM-side via
higher-order array lambdas; global top-k uses Spark's TakeOrdered — no
full sort materialization).  The scale path is random-hyperplane LSH:
per-row signature map-side, then candidates share a bucket — turning the
O(N) scan per query into a bucket lookup, at recall cost controlled by
``planes``/``tables``.

Embedding-cosine near-duplicate detection composes the same pieces:
LSH bucket self-join → exact cosine within buckets → threshold.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_to_query(vec: Column, query: Sequence[float]) -> Column:
    """Cosine similarity of an embedding column vs a fixed query vector.
    The query norm is folded in as a Python constant."""
    qlit = F.array(*[F.lit(float(x)) for x in query])
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    denom = _norm(vec) * F.lit(qnorm)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(_dot(vec, qlit) / denom)


def cosine_scores(
    df: DataFrame,
    query: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All (id, cosine) scores vs the query — exact, one scan."""
    return df.select(
        F.col(id_col),
        cosine_to_query(F.col(vec_col), query).alias("cosine"),
    )


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine (ties broken by id for determinism).
    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — each task
    keeps a k-heap, the driver merges; no global sort."""
    scored = cosine_scores(df, query, vec_col, id_col)
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (Gaussian, seeded stdlib RNG —
    no numpy dependency in the plan)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def lsh_bucket(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(vec · plane_i)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, plit) >= 0.0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.
    At scale the bucketed table is precomputed/partitioned by bucket so
    a query touches ~N/2^planes rows."""
    dim = len(query)
    hp = hyperplanes(dim, planes, seed)
    qbucket = 0
    for i, p in enumerate(hp):
        if sum(a * b for a, b in zip(query, p)) >= 0.0:
            qbucket |= 1 << i
    candidates = df.filter(lsh_bucket(F.col(vec_col), hp) == F.lit(qbucket))
    return brute_force_topk(candidates, query, k, vec_col, id_col)


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH bucket self-join →
    exact cosine within bucket → threshold.  ``max_bucket`` caps
    degenerate buckets (skew control)."""
    dim_probe = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    dim = dim_probe[0]["d"] if dim_probe else 0
    hp = hyperplanes(dim, planes, seed)
    bucketed = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        lsh_bucket(F.col(vec_col), hp).alias("__b"),
    )
    sizes = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    bucketed = bucketed.join(
        sizes.filter(F.col("__n") <= max_bucket), on="__b", how="inner"
    )
    a = bucketed.select("__b", F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    b = bucketed.select("__b", F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    pairs = a.join(b, on="__b", how="inner").filter(F.col("id_a") < F.col("id_b"))
    denom = _norm(F.col("__va")) * _norm(F.col("__vb"))
    cos = F.when(denom == 0.0, F.lit(0.0)).otherwise(
        _dot(F.col("__va"), F.col("__vb")) / denom
    )
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )

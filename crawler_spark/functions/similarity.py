"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — pure JVM expressions
(``F.zip_with``/``F.aggregate`` dot products), blocked self-join.
Scale path: random-hyperplane LSH bucketing so the pairwise work happens
inside buckets only; buckets are derived from deterministic pseudo-random
planes (seeded), all inside one Arrow-vectorized pandas UDF using numpy
matmul per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. The corpus side should be the smaller
    one (it broadcasts); at 100 TB you flip which side broadcasts or move to
    the LSH path. Deterministic tiebreak: (sim desc, neighbor id asc)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = q.join(F.broadcast(c), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_bucket_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Random-hyperplane LSH: sign pattern over ``n_planes`` fixed
    hyperplanes → one int64 bucket. numpy matmul per Arrow batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float64)

    @pandas_udf(LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # (batch, dim)
        signs = (mat @ planes) > 0  # (batch, planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(signs @ weights)

    return _bucket


def lsh_topk(
    df: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine *within* LSH buckets.

    Recall < 1 by construction (that's the approximation); candidate work is
    O(sum of bucket²) instead of O(n²). At 10^9 vectors you'd also shard by
    multiple hash tables; the bucket-join shape is the same.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    bucket = lsh_bucket_udf(dim, n_planes)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    l = b.select("bucket", F.col("id").alias("query_id"), F.col("v").alias("qv"))
    r = b.select("bucket", F.col("id").alias("neighbor_id"), F.col("v").alias("cv"))
    scored = (
        l.join(r, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (blocked exact variant)."""
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    keys = []
    if block_col:
        cols.append(F.col(block_col).alias("__blk"))
        keys = ["__blk"]
    base = df.select(*cols)
    l = base.select(*keys, F.col("id").alias("id_a"), F.col("v").alias("va"))
    r = base.select(*keys, F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pairs = (l.join(r, keys) if keys else l.crossJoin(r)).where(
        F.col("id_a") < F.col("id_b")
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
    ).where(F.col("cos_sim") >= threshold)

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


BRUTE_FORCE_MAX_CORPUS = 1_000_000  # rows the corpus broadcast may hold


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_full_scan: bool = False,
) -> DataFrame:
    """Exact cosine top-k per query — the documented EXACT BASELINE.

    The whole corpus broadcasts and every query row scans it, so this is
    O(|queries|·|corpus|) and driver/executor memory is bounded by the
    corpus broadcast: correct and fast for a bounded corpus, an OOM at 10⁹
    vectors. Like ``embedding_neardup_pairs``'s block_col requirement, the
    scale footgun is guarded: a corpus above ``BRUTE_FORCE_MAX_CORPUS`` rows
    raises unless ``allow_full_scan=True`` — use ``lsh_topk`` / ``ivf_topk``
    (the scale paths) instead. Deterministic tiebreak: (sim desc, id asc).
    """
    if not allow_full_scan:
        # bounded probe: limit(MAX+1) stops the scan at the threshold
        # instead of counting the whole corpus (and allow_full_scan=True
        # skips the job entirely — its result would be unused)
        probe = corpus.limit(BRUTE_FORCE_MAX_CORPUS + 1).count()
        if probe > BRUTE_FORCE_MAX_CORPUS:
            raise ValueError(
                f"brute_force_topk: corpus exceeds {BRUTE_FORCE_MAX_CORPUS}"
                " rows — broadcasting it would OOM and the per-query full"
                " scan is quadratic. Use lsh_topk/ivf_topk, or pass"
                " allow_full_scan=True if you really mean it."
            )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = q.join(F.broadcast(c), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
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
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
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


def axis_lsh_topk(
    df: DataFrame,
    k: int = 3,
    coords: tuple[int, ...] = (0, 1, 2, 3, 4, 5),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with COORDINATE-sign LSH buckets.

    Same bucket-join/top-k shape as ``lsh_topk`` but the "hyperplanes" are
    the coordinate axes at the given positions: bucket bit j is
    ``embedding[coords[j]] >= 0``. A weaker hash family than random
    hyperplanes (the production default), but fully deterministic and
    SQL-expressible — both engines compute the identical bucket, so the
    whole approximate pipeline (bucketing + in-bucket exact cosine + rank)
    gets an exact DuckDB oracle instead of a rows-only check. Pure JVM: no
    Python anywhere.
    """
    bucket = F.lit(0)
    for j, c in enumerate(coords):
        bucket = bucket + F.when(
            F.element_at(F.col(vec_col), c + 1) >= 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        bucket.cast("long").alias("bucket"),
    )
    l = b.select("bucket", F.col("id").alias("query_id"), F.col("v").alias("qv"))
    r = b.select("bucket", F.col("id").alias("neighbor_id"), F.col("v").alias("cv"))
    scored = (
        l.join(r, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
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


def _kmeans_centroids(
    df: DataFrame,
    n_cells: int,
    n_iters: int,
    id_col: str,
    vec_col: str,
    dim: int,
) -> np.ndarray:
    """Deterministic coarse quantizer: init = first n_cells vectors by id,
    then Lloyd iterations where assignment is a broadcast numpy argmin in a
    pandas UDF and the centroid update is a DataFrame aggregation
    (posexplode dims → avg) — the shape that scales to 10^9 vectors."""
    init = (
        df.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    centroids = np.array([list(r[0]) for r in init], dtype=np.float64)

    for _ in range(n_iters):
        assign = assign_cell_udf(centroids)
        assigned = df.select(
            assign(F.col(vec_col)).alias("cell"),
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        rows = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        nxt = centroids.copy()  # empty cells keep their previous centroid
        for r in rows:
            nxt[r["cell"], r["pos"]] = r["m"]
        centroids = nxt
    return centroids


def assign_cell_udf(centroids: np.ndarray):
    """vector → nearest-centroid index (argmin L2), numpy per Arrow batch."""
    c = centroids.copy()
    c_sq = (c * c).sum(axis=1)

    @pandas_udf(LongType())
    def _assign(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        # ||v - c||² = ||v||² - 2 v·c + ||c||²; ||v||² constant per row
        d = -2.0 * (mat @ c.T) + c_sq[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int64))

    return _assign


def ivf_topk(
    df: DataFrame,
    k: int = 3,
    n_cells: int = 8,
    nprobe: int = 2,
    n_iters: int = 2,
    query_filter=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse k-means cells; each query scans only
    its ``nprobe`` nearest cells. ``nprobe == n_cells`` degenerates to the
    exact brute force (the correctness anchor the tests pin). At 10^9
    vectors the cell assignment is a partition key, so the candidate join
    shuffles each query to nprobe cells instead of broadcasting the corpus.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    centroids = _kmeans_centroids(df, n_cells, n_iters, id_col, vec_col, dim)
    assign = assign_cell_udf(centroids)

    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        assign(F.col(vec_col)).alias("cell"),
    )
    queries = df if query_filter is None else df.where(query_filter)

    c = centroids.copy()
    c_sq = (c * c).sum(axis=1)
    npb = nprobe

    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(LongType()))
    def _probes(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        d = -2.0 * (mat @ c.T) + c_sq[None, :]
        order = np.argsort(d, axis=1)[:, :npb].astype(np.int64)
        return pd.Series(list(order))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(_probes(F.col(vec_col))).alias("cell"),
    )
    scored = q.join(corpus, "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
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
    round_to: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (blocked exact variant).

    A block key is REQUIRED: the only alternative is an all-pairs cartesian
    join, which is a scale-killer one default away at 10^9 vectors. Callers
    without a natural block key should bucket first (``lsh_topk``'s
    hyperplane buckets give one) and pass the bucket column here.

    ``round_to=None`` (default) emits the raw IEEE double: with the same
    element order and float32-multiply/double-accumulate arithmetic any
    engine reproduces it BIT-FOR-BIT, whereas decimal rounding is the one
    step engines implement differently (double-rounding flips the last
    digit for values near a .5 boundary — measured at sf0.1). Pass an int
    only for display.
    """
    if not block_col:
        raise ValueError(
            "embedding_neardup_pairs requires block_col: unblocked all-pairs "
            "is a cartesian join; derive buckets via lsh_bucket_udf first"
        )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.col(block_col).alias("__blk"),
    )
    keys = ["__blk"]
    l = base.select(*keys, F.col("id").alias("id_a"), F.col("v").alias("va"))
    r = base.select(*keys, F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pairs = l.join(r, keys).where(F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("va"), F.col("vb"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    return pairs.select(
        "id_a",
        "id_b",
        sim.alias("cos_sim"),
    ).where(F.col("cos_sim") >= threshold)

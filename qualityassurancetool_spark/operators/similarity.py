"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — queries broadcast against the corpus,
dot products as sequential ``zip_with``/``aggregate`` folds (deterministic
left-to-right accumulation in double — bit-reproducible across engines,
unlike parallel float reductions).  Scale path: LSH bucketing via random
hyperplanes (deterministic md5-seeded) so each query probes one bucket
neighborhood instead of the full corpus; and an IVF-style coarse
quantization using top-variance dims.

At 100 TB the corpus side stays partitioned; only queries broadcast.  Top-k
per query is a window ``row_number`` — shuffle bounded by candidate count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self-matches).

    ``queries`` must be small (it is broadcast); the corpus never moves.
    Deterministic tie-break on (similarity desc, corpus id asc).
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
    )
    from qualityassurancetool_spark.functions.partitioning import (
        ensure_min_parallelism,
    )

    joined = ensure_min_parallelism(corpus).alias("c").join(
        F.broadcast(q), F.col(query_id_col) != F.col(f"c.{id_col}")
    )
    sim = cosine_similarity(F.col("_qvec"), F.col(f"c.{vec_col}"))
    scored = joined.select(
        F.col(query_id_col),
        F.col(f"c.{id_col}").alias("neighbor_id"),
        sim.alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance (deterministic, like
    :func:`dot_product`)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    n_nearest: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cent_id_col: str = "cent_id",
    cent_vec_col: str = "cent_vec",
) -> DataFrame:
    """Assign each vector to its ``n_nearest`` centroids by squared-L2
    (deterministic tie-break on centroid id).  Centroids broadcast; the
    corpus never shuffles for assignment.  Output: corpus columns +
    ``cluster_id`` (+ ``_cent_rank`` when n_nearest > 1)."""
    from qualityassurancetool_spark.functions.partitioning import (
        ensure_min_parallelism,
    )

    joined = ensure_min_parallelism(corpus).join(F.broadcast(centroids))
    d = l2_sq(F.col(vec_col), F.col(cent_vec_col))
    w = Window.partitionBy(id_col).orderBy(d.asc(), F.col(cent_id_col).asc())
    out = (
        joined.withColumn("_cent_rank", F.row_number().over(w))
        .where(F.col("_cent_rank") <= n_nearest)
        .withColumn("cluster_id", F.col(cent_id_col))
        .drop(cent_id_col, cent_vec_col)
    )
    return out.drop("_cent_rank") if n_nearest == 1 else out


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors live in their nearest
    centroid's inverted list; each query scores only the lists of its
    ``nprobe`` nearest centroids.

    The 100 TB shape: centroids are a broadcast dim (10^3-10^5 rows); the
    corpus is partitioned/bucketed by ``cluster_id`` so a query touches
    ``nprobe/n_centroids`` of the data; queries broadcast.  Work ratio vs
    brute force ~= nprobe / n_centroids.
    """
    c_assigned = ivf_assign(
        corpus, centroids, 1, vec_col, id_col
    )
    q_assigned = ivf_assign(
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
        ),
        centroids,
        nprobe,
        "_qvec",
        query_id_col,
    ).select(query_id_col, "_qvec", "cluster_id")
    joined = c_assigned.alias("c").join(
        F.broadcast(q_assigned).alias("q"),
        (F.col("c.cluster_id") == F.col("q.cluster_id"))
        & (F.col(query_id_col) != F.col(f"c.{id_col}")),
    )
    sim = cosine_similarity(F.col("_qvec"), F.col(f"c.{vec_col}"))
    scored = joined.select(
        F.col(query_id_col),
        F.col(f"c.{id_col}").alias("neighbor_id"),
        sim.alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — reproducible
    across runs/engines without RNG state."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"plane{plane_idx}:{d}".encode()).hexdigest()
        # map 8 hex chars to [-1, 1)
        vals.append(int(h[:8], 16) / float(2 ** 31) - 1.0)
    return vals


def lsh_bucket_id(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket (n_planes sign bits → int)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        s = dot_product(vec, plane)
        bucket = bucket + F.when(s >= 0, F.lit(2 ** p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket are
    scored.  ~2^n_planes× less work than brute force; recall depends on
    bucket granularity (callers trade n_planes for recall)."""
    from qualityassurancetool_spark.functions.partitioning import (
        ensure_min_parallelism,
    )

    c = ensure_min_parallelism(corpus).withColumn(
        "_bucket", lsh_bucket_id(F.col(vec_col), dim, n_planes)
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket_id(F.col(vec_col), dim, n_planes).alias("_qbucket"),
    )
    joined = c.alias("c").join(
        F.broadcast(q),
        (F.col("c._bucket") == F.col("_qbucket"))
        & (F.col(query_id_col) != F.col(f"c.{id_col}")),
    )
    sim = cosine_similarity(F.col("_qvec"), F.col(f"c.{vec_col}"))
    scored = joined.select(
        F.col(query_id_col),
        F.col(f"c.{id_col}").alias("neighbor_id"),
        sim.alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )

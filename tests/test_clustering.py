"""Lloyd's k-means + SemDeDup semantic dedup (operators/clustering)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)

DIM = 8
CENTERS = [
    [10.0] * DIM,
    [-10.0] * DIM,
    [10.0] * 4 + [-10.0] * 4,
]


def _blobs(n_per: int, seed: int = 0):
    """Well-separated gaussian blobs; ids interleave blobs so the stride
    init picks spread-out seeds."""
    rng = random.Random(seed)
    rows = []
    i = 0
    for j in range(n_per):
        for b, c in enumerate(CENTERS):
            rows.append(
                (i, [x + rng.gauss(0, 0.5) for x in c], b)
            )
            i += 1
    return rows


def test_kmeans_recovers_blobs(spark):
    rows = _blobs(30)
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    )
    cents = kmeans_fit(df, k=3, max_iter=8, init_stride=7)
    out = kmeans_assign(df, cents)
    got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    truth = {i: b for i, _, b in rows}
    # cluster ids are arbitrary labels: check the partition matches via
    # purity — every kmeans cluster maps to exactly one blob
    by_cluster: dict[int, set[int]] = {}
    for i, c in got.items():
        by_cluster.setdefault(c, set()).add(truth[i])
    assert all(len(blobs) == 1 for blobs in by_cluster.values())
    assert len(by_cluster) == 3


def test_empty_cluster_keeps_centroid(spark):
    """k larger than the natural cluster count must not crash; surplus
    centroids go (or stay) empty."""
    rows = _blobs(10)
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    )
    cents = kmeans_fit(df, k=6, max_iter=4, init_stride=5)
    assert len(cents) == 6
    out = kmeans_assign(df, cents)
    assert out.count() == len(rows)


def test_semantic_dedup_drops_scaled_clones(spark):
    """A scaled copy (cosine == 1) of a lower-id vector is dropped and
    points at it; originals stay kept.  Random 32-dim directions keep
    non-clone cosines far below the threshold (std ~ 1/sqrt(32))."""
    rng = random.Random(13)
    data = [
        (i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(60)
    ]
    clones = [(i + 1000, [x * 1.5 for x in v]) for i, v in data[:9]]
    df = spark.createDataFrame(
        data + clones, "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in semantic_dedup(
        df, k=2, max_iter=3, threshold=0.99, init_stride=7
    ).collect()}
    for i, _ in clones:
        assert out[i]["kept"] is False
        assert out[i]["dup_of"] == i - 1000
    for i, _ in data:
        assert out[i]["kept"] is True, i


def test_kmeans_empty_corpus_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kmeans_fit(df, k=2)


def _blobs_sorted_by_blob(n_per: int, seed: int = 1):
    """Adversarial id layout: ALL of blob 0's ids come before blob 1's,
    etc., so stride init seeds every centroid inside blob 0."""
    rng = random.Random(seed)
    rows = []
    i = 0
    for b, c in enumerate(CENTERS):
        for _ in range(n_per):
            rows.append((i, [x + rng.gauss(0, 0.5) for x in c], b))
            i += 1
    return rows


def test_parallel_init_recovers_blobs_where_stride_cannot(spark):
    from qualityassurancetool_spark.operators.clustering import (
        kmeans_parallel_init,
    )

    rows = _blobs_sorted_by_blob(40)
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    )
    truth = {i: b for i, _, b in rows}

    def purity(cents):
        got = {
            r["vec_id"]: r["cluster_id"]
            for r in kmeans_assign(df, cents).collect()
        }
        by_cluster: dict[int, set[int]] = {}
        for i, c in got.items():
            by_cluster.setdefault(c, set()).add(truth[i])
        return by_cluster

    # stride seeds all inside blob 0 (ids 0..2*stride are blob 0): Lloyd
    # cannot discover blobs 1/2 — some cluster stays mixed
    stride_cents = kmeans_fit(df, k=3, max_iter=8, init_stride=7)
    assert any(len(b) > 1 for b in purity(stride_cents).values())

    par_cents = kmeans_fit(df, k=3, max_iter=8, init="parallel")
    by_cluster = purity(par_cents)
    assert all(len(b) == 1 for b in by_cluster.values())
    assert len(by_cluster) == 3

    # hash-random sampling is deterministic: bit-identical re-run
    assert kmeans_parallel_init(df, k=3) == kmeans_parallel_init(df, k=3)


def test_parallel_init_validation(spark):
    from qualityassurancetool_spark.operators.clustering import (
        kmeans_parallel_init,
    )

    df = spark.createDataFrame(
        [(0, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):  # 1 candidate < k
        kmeans_parallel_init(df, k=3)
    empty = df.where(F.col("vec_id") < 0)
    with pytest.raises(ValueError):
        kmeans_parallel_init(empty, k=2)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=1, init="nope")

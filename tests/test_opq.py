"""Optimized Product Quantization (operators/opq).
No SQL oracle (FP-iterative SVD — the PCA precedent); gate is
orthonormality + objective improvement + strategy parity + determinism."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.opq import (
    opq_encode,
    opq_fit,
    opq_topk,
    quantization_error,
    rotate_vectors,
)
from qualityassurancetool_spark.operators.pq import pq_encode, pq_fit


@pytest.fixture(scope="module")
def corr(spark):
    """Strongly cross-subspace-correlated vectors: dims 0..3 carry the
    signal, dims 4..7 are scaled copies — plain PQ's fixed [0:4]/[4:8]
    cut wastes half its budget on redundancy a rotation removes."""
    rng = random.Random(5)
    rows = []
    for i in range(600):
        base = [rng.gauss(0, 1) for _ in range(4)]
        rows.append(
            (i, [*base, *(0.9 * b + rng.gauss(0, 0.05) for b in base)])
        )
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8).persist()


def test_rotation_is_orthonormal_and_improves_objective(corr):
    R, books = opq_fit(corr, m=2, k=8, opq_iters=3, lloyd_iters=4)
    Rnp = np.asarray(R)
    assert np.allclose(Rnp @ Rnp.T, np.eye(len(R)), atol=1e-9)

    pq_books = pq_fit(corr, m=2, k=8, max_iter=4)
    eye = np.eye(len(R)).tolist()
    pq_err = quantization_error(
        pq_encode(corr, pq_books, strategy="gemm"), eye, pq_books
    )
    opq_err = quantization_error(
        opq_encode(corr, R, books), R, books
    )
    assert opq_err < 0.9 * pq_err  # rotation must actually help here


def test_rotate_strategy_parity(spark, corr):
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.normal(size=(8, 8)))
    R = q.tolist()
    a = {
        r["vec_id"]: r["v"]
        for r in rotate_vectors(corr, R, out_col="v", strategy="gemm")
        .select("vec_id", "v")
        .collect()
    }
    b = {
        r["vec_id"]: r["v"]
        for r in rotate_vectors(corr, R, out_col="v", strategy="column")
        .select("vec_id", "v")
        .collect()
    }
    for i in a:
        assert a[i] == pytest.approx(b[i], abs=1e-12)
    with pytest.raises(ValueError):
        rotate_vectors(corr, R, strategy="nope")


def test_encode_matches_manual_rotation(corr):
    R, books = opq_fit(corr, m=2, k=8, opq_iters=1, lloyd_iters=2)
    via_op = {
        r["vec_id"]: list(r["pq_code"])
        for r in opq_encode(corr, R, books).select("vec_id", "pq_code").collect()
    }
    manual = pq_encode(
        rotate_vectors(corr, R), books, strategy="gemm"
    )
    via_manual = {
        r["vec_id"]: list(r["pq_code"])
        for r in manual.select("vec_id", "pq_code").collect()
    }
    assert via_op == via_manual
    # rotation never leaks into the output schema
    assert "_rot" not in opq_encode(corr, R, books).columns


def test_fit_deterministic(corr):
    r1 = opq_fit(corr, m=2, k=8, opq_iters=2, lloyd_iters=2)
    r2 = opq_fit(corr, m=2, k=8, opq_iters=2, lloyd_iters=2)
    assert r1 == r2


def test_topk_finds_self(spark, corr):
    R, books = opq_fit(corr, m=2, k=8, opq_iters=2, lloyd_iters=3)
    coded = opq_encode(corr, R, books)
    queries = corr.where(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = opq_topk(coded, queries, R, books, k=5)
    # shape contract: k rows per query
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in counts)

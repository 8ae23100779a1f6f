"""PCA / whitening (operators/pca) vs numpy on the same data."""

from __future__ import annotations

import random

import numpy as np
import pytest

from qualityassurancetool_spark.operators.pca import (
    covariance_stats,
    pca_fit,
    pca_transform,
)

DIM, N = 12, 300


def _data(seed=4):
    rng = random.Random(seed)
    # anisotropic: big variance on two known directions
    base = []
    for _ in range(N):
        a, b = rng.gauss(0, 5), rng.gauss(0, 2)
        v = [rng.gauss(0, 0.3) for _ in range(DIM)]
        v[0] += a
        v[3] += b
        base.append(v)
    return base


def test_covariance_matches_numpy(spark):
    data = _data()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)],
        "vec_id long, embedding array<double>",
    )
    n, mean, cov = covariance_stats(df)
    mat = np.asarray(data)
    assert n == N
    assert np.allclose(mean, mat.mean(axis=0), atol=1e-9)
    assert np.allclose(
        np.asarray(cov), np.cov(mat, rowvar=False, bias=True), atol=1e-9
    )


def test_pca_projection_and_whitening(spark):
    data = _data()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)],
        "vec_id long, embedding array<double>",
    )
    model = pca_fit(df, k=3)
    comps = np.asarray(model["components"])
    # row-orthonormal, variance-ordered
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-8)
    ev = model["explained_variance"]
    assert ev[0] >= ev[1] >= ev[2] > 0
    # the top component points along axis 0 (the big planted variance)
    assert abs(comps[0][0]) > 0.95

    out = {
        r["vec_id"]: r["projected"]
        for r in pca_transform(df, model).collect()
    }
    mat = np.asarray(data)
    ref = (mat - mat.mean(axis=0)) @ comps.T
    got = np.asarray([out[i] for i in range(N)])
    assert np.allclose(got, ref, atol=1e-8)
    # projected variance equals the eigenvalues
    assert np.allclose(got.var(axis=0), ev, rtol=1e-6)

    white = pca_fit(df, k=3, whiten=True)
    wout = np.asarray([
        r["projected"]
        for r in pca_transform(df, white).orderBy("vec_id").collect()
    ])
    assert np.allclose(wout.var(axis=0), 1.0, rtol=1e-6)


def test_empty_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        covariance_stats(df)

"""Multi-feature linear regression (one-pass normal equations):
exact recovery, numpy parity, ridge shrinkage, degenerate inputs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.regression import (
    apply_linear_model,
    fit_linear_model,
)


def _synth(spark, n=500, d=3, noise=0.0, seed=11):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    w = np.arange(1, d + 1, dtype=float)
    y = X @ w + 2.5 + noise * rng.normal(size=n)
    rows = [tuple(map(float, list(x) + [yy])) for x, yy in zip(X, y)]
    cols = [f"x{i}" for i in range(d)] + ["y"]
    return spark.createDataFrame(rows, cols), cols[:-1], X, y


def test_exact_recovery_noiseless(spark):
    df, feats, _, _ = _synth(spark, noise=0.0)
    m = fit_linear_model(df, feats, "y")
    assert m["weights"] == pytest.approx([1.0, 2.0, 3.0], abs=1e-8)
    assert m["bias"] == pytest.approx(2.5, abs=1e-8)
    assert m["r2"] == pytest.approx(1.0, abs=1e-10)
    assert m["n"] == 500


def test_numpy_lstsq_parity_with_noise(spark):
    df, feats, X, y = _synth(spark, noise=0.7, seed=5)
    m = fit_linear_model(df, feats, "y")
    A = np.column_stack([np.ones(len(y)), X])
    ref, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert m["bias"] == pytest.approx(ref[0], abs=1e-7)
    assert m["weights"] == pytest.approx(list(ref[1:]), abs=1e-7)
    # r2 matches the residual definition
    pred = A @ ref
    sse = float(((y - pred) ** 2).sum())
    sst = float(((y - y.mean()) ** 2).sum())
    assert m["r2"] == pytest.approx(1 - sse / sst, abs=1e-7)


def test_ridge_shrinks_weights(spark):
    df, feats, _, _ = _synth(spark, noise=0.5, seed=7)
    m0 = fit_linear_model(df, feats, "y")
    m1 = fit_linear_model(df, feats, "y", l2=500.0)
    n0 = sum(w * w for w in m0["weights"])
    n1 = sum(w * w for w in m1["weights"])
    assert n1 < n0
    # ridge r2 never exceeds the OLS r2 (OLS is the SSE minimizer)
    assert m1["r2"] <= m0["r2"] + 1e-12


def test_ridge_matches_closed_form(spark):
    df, feats, X, y = _synth(spark, noise=0.4, seed=9)
    l2 = 25.0
    m = fit_linear_model(df, feats, "y", l2=l2)
    A = np.column_stack([np.ones(len(y)), X])
    G = A.T @ A + l2 * np.diag([0.0, 1, 1, 1])
    ref = np.linalg.solve(G, A.T @ y)
    assert m["bias"] == pytest.approx(ref[0], abs=1e-7)
    assert m["weights"] == pytest.approx(list(ref[1:]), abs=1e-7)


def test_collinear_raises_without_ridge(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 7.0), (3.0, 6.0, 9.0),
         (4.0, 8.0, 12.0)],
        ["a", "b", "y"],  # b = 2a exactly
    )
    with pytest.raises(ValueError, match="singular|collinear"):
        fit_linear_model(df, ["a", "b"], "y")
    m = fit_linear_model(df, ["a", "b"], "y", l2=1e-6)
    assert all(np.isfinite(m["weights"]))


def test_null_rows_dropped_and_empty_raises(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (None, 3.0), (2.0, None), (3.0, 6.0),
         (5.0, 10.0)],
        "x double, y double",
    )
    m = fit_linear_model(df, ["x"], "y")
    assert m["n"] == 3
    assert m["weights"][0] == pytest.approx(2.0, abs=1e-9)
    with pytest.raises(ValueError, match="no complete rows"):
        fit_linear_model(df.where(F.col("x") > 99), ["x"], "y")


def test_constant_y_r2_null(spark):
    df = spark.createDataFrame(
        [(1.0, 4.0), (2.0, 4.0), (3.0, 4.0)], ["x", "y"]
    )
    m = fit_linear_model(df, ["x"], "y")
    assert m["r2"] is None
    assert m["weights"][0] == pytest.approx(0.0, abs=1e-9)
    assert m["bias"] == pytest.approx(4.0, abs=1e-9)


def test_validation(spark):
    df = spark.createDataFrame([(1.0, 1.0)], ["x", "y"])
    with pytest.raises(ValueError):
        fit_linear_model(df, [], "y")
    with pytest.raises(ValueError):
        fit_linear_model(df, ["x", "x"], "y")
    with pytest.raises(ValueError):
        fit_linear_model(df, ["x"], "y", l2=-1.0)


def test_apply_linear_model(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 4.0)], ["a", "b"]
    )
    out = apply_linear_model(
        df,
        {"feature_cols": ["a", "b"], "weights": [2.0, -1.0],
         "bias": 0.5},
    ).collect()
    assert [r["prediction"] for r in out] == [0.5, 2.5]

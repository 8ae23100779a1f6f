"""train_logistic_regression — full-batch GD as iterated aggregation."""

import math

import pytest

from qualityassurancetool_spark.operators.logreg import (
    apply_logistic_regression,
    train_logistic_regression,
)


def _py_gd(rows, d, iters, lr, l2=0.0):
    """Reference implementation: identical arithmetic, same order."""
    w, b = [0.0] * d, 0.0
    n = len(rows)
    for _ in range(iters):
        gb = 0.0
        g = [0.0] * d
        for *x, y in rows:
            p = 1.0 / (1.0 + math.exp(-(b + sum(wj * xj for wj, xj in zip(w, x)))))
            e = p - y
            gb += e
            for j in range(d):
                g[j] += e * x[j]
        b -= lr * gb / n
        w = [wj - lr * (gj / n + l2 * wj) for wj, gj in zip(w, g)]
    return w, b


def _sep_rows():
    # linearly separable in x1 - x2
    rows = []
    for i in range(60):
        x1 = (i % 10) / 10.0
        x2 = ((i * 7) % 10) / 10.0
        y = 1.0 if x1 - x2 > 0 else 0.0
        rows.append((x1, x2, y))
    return rows


def test_matches_reference_implementation(spark):
    rows = _sep_rows()
    df = spark.createDataFrame(
        rows, schema="x1 double, x2 double, y double"
    )
    m = train_logistic_regression(
        df, ["x1", "x2"], "y", iters=20, lr=0.5, standardize=False
    )
    w_ref, b_ref = _py_gd(rows, 2, 20, 0.5)
    assert abs(m["bias"] - b_ref) < 1e-9
    for got, ref in zip(m["weights"], w_ref):
        assert abs(got - ref) < 1e-9
    assert m["n"] == 60


def test_learns_separable_boundary(spark):
    rows = _sep_rows()
    df = spark.createDataFrame(
        rows, schema="x1 double, x2 double, y double"
    )
    m = train_logistic_regression(df, ["x1", "x2"], "y", iters=200)
    scored = apply_logistic_regression(df, m).collect()
    acc = sum(
        1 for r in scored if (r["score"] > 0.5) == (r["y"] > 0.5)
    ) / len(scored)
    assert acc >= 0.95
    # separating direction: positive on x1, negative on x2
    assert m["weights"][0] > 0 > m["weights"][1]


def test_standardize_folds_back_to_original_space(spark):
    # heavily skewed feature scales: standardized training must
    # return coefficients usable on the RAW features
    rows = [
        (1000.0 * x1, 0.001 * x2, y) for x1, x2, y in _sep_rows()
    ]
    df = spark.createDataFrame(
        rows, schema="x1 double, x2 double, y double"
    )
    m = train_logistic_regression(df, ["x1", "x2"], "y", iters=300)
    scored = apply_logistic_regression(df, m).collect()
    acc = sum(
        1 for r in scored if (r["score"] > 0.5) == (r["y"] > 0.5)
    ) / len(scored)
    assert acc >= 0.95


def test_l2_shrinks_weights(spark):
    df = spark.createDataFrame(
        _sep_rows(), schema="x1 double, x2 double, y double"
    )
    free = train_logistic_regression(
        df, ["x1", "x2"], "y", iters=100, standardize=False
    )
    reg = train_logistic_regression(
        df, ["x1", "x2"], "y", iters=100, l2=0.5, standardize=False
    )
    assert sum(w * w for w in reg["weights"]) < sum(
        w * w for w in free["weights"]
    )


def test_null_rows_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (None, 0.0), (0.0, None), (0.0, 0.0)],
        schema="x1 double, y double",
    )
    m = train_logistic_regression(
        df, ["x1"], "y", iters=2, standardize=False
    )
    assert m["n"] == 2
    with pytest.raises(ValueError):
        train_logistic_regression(df, [], "y")
    with pytest.raises(ValueError):
        train_logistic_regression(df, ["x1"], "y", iters=0)
    with pytest.raises(ValueError):
        train_logistic_regression(
            df.where("x1 > 99"), ["x1"], "y", iters=1
        )

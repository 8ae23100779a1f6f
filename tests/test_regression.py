"""grouped_ols + correlation_pairs — one-pass moment fits."""

import math

import pytest

from qualityassurancetool_spark.operators.regression import (
    correlation_pairs,
    grouped_ols,
)


def _df(spark, rows, schema="g string, x double, y double"):
    return spark.createDataFrame(rows, schema=schema)


def test_exact_line_and_noise(spark):
    # group a: y = 2x + 3 exactly; group b: known hand-fit
    a = [("a", float(i), 2.0 * i + 3.0) for i in range(10)]
    b = [("b", 0.0, 1.0), ("b", 1.0, 3.0), ("b", 2.0, 4.0)]
    got = {
        r["g"]: r
        for r in grouped_ols(
            _df(spark, a + b), "x", "y", ["g"]
        ).collect()
    }
    assert got["a"]["n"] == 10
    assert abs(got["a"]["slope"] - 2.0) < 1e-12
    assert abs(got["a"]["intercept"] - 3.0) < 1e-12
    assert abs(got["a"]["r2"] - 1.0) < 1e-12
    # numpy.polyfit reference for b: slope 1.5, intercept 2/3-0.5=...
    assert abs(got["b"]["slope"] - 1.5) < 1e-12
    assert abs(got["b"]["intercept"] - (8.0 / 3 - 1.5)) < 1e-12


def test_degenerate_fits_null(spark):
    rows = [
        ("one_point", 1.0, 5.0),
        ("const_x", 2.0, 1.0),
        ("const_x", 2.0, 9.0),
        ("const_y", 0.0, 7.0),
        ("const_y", 1.0, 7.0),
    ]
    got = {
        r["g"]: r
        for r in grouped_ols(
            _df(spark, rows), "x", "y", ["g"]
        ).collect()
    }
    assert got["one_point"]["slope"] is None
    assert got["const_x"]["slope"] is None
    # constant y with varying x: exact flat fit, r2 = 1 (SQL regr_r2)
    assert got["const_y"]["slope"] == 0.0
    assert got["const_y"]["r2"] == 1.0


def test_pairwise_null_deletion(spark):
    rows = [
        ("a", 0.0, 0.0),
        ("a", 1.0, 2.0),
        ("a", None, 99.0),
        ("a", 5.0, None),
        ("a", 2.0, 4.0),
    ]
    r = grouped_ols(_df(spark, rows), "x", "y", ["g"]).collect()[0]
    assert r["n"] == 3
    assert abs(r["slope"] - 2.0) < 1e-12


def test_global_fit_no_groups(spark):
    rows = [("g", float(i), 3.0 * i - 1.0) for i in range(5)]
    r = grouped_ols(_df(spark, rows), "x", "y").collect()[0]
    assert abs(r["slope"] - 3.0) < 1e-12 and r["n"] == 5


def test_validation(spark):
    df = _df(spark, [("a", 1.0, 2.0)])
    with pytest.raises(ValueError):
        grouped_ols(df, "x", "y", min_points=1)
    with pytest.raises(ValueError):
        correlation_pairs(df, ["x"])
    with pytest.raises(ValueError):
        correlation_pairs(df, ["x", "x"])


def test_correlation_matrix(spark):
    rows = [
        (float(i), 2.0 * i + 1.0, float(-i), 5.0)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, schema="a double, b double, c double, d double"
    )
    got = {
        (r["col_a"], r["col_b"]): r
        for r in correlation_pairs(df, ["a", "b", "c", "d"]).collect()
    }
    assert len(got) == 6
    assert abs(got[("a", "b")]["corr"] - 1.0) < 1e-12
    assert abs(got[("a", "c")]["corr"] + 1.0) < 1e-12
    assert got[("a", "d")]["corr"] is None  # constant column
    assert got[("a", "b")]["n"] == 8


def test_correlation_matches_python(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (rnd.random(), rnd.random() * 3 - 1) for _ in range(100)
    ]
    df = spark.createDataFrame(rows, schema="x double, y double")
    r = correlation_pairs(df, ["x", "y"]).collect()[0]
    xs, ys = [a for a, _ in rows], [b for _, b in rows]
    n = len(rows)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in rows)
    den = math.sqrt(
        sum((a - mx) ** 2 for a in xs)
        * sum((b - my) ** 2 for b in ys)
    )
    assert abs(r["corr"] - num / den) < 1e-9

"""target_encode + chi_squared — in-engine tabular feature prep."""

import pytest

from qualityassurancetool_spark.operators.feature_prep import (
    chi_squared,
    target_encode,
)


def _df(spark, rows, schema="cat string, y double"):
    return spark.createDataFrame(rows, schema=schema)


def test_plain_target_encoding(spark):
    df = _df(
        spark,
        [("a", 1.0), ("a", 0.0), ("a", 1.0), ("b", 0.0), ("b", 0.0)],
    )
    got = {
        (r["cat"], r["y"]): r["cat_te"]
        for r in target_encode(df, "cat", "y").collect()
    }
    assert abs(got[("a", 1.0)] - 2.0 / 3) < 1e-12
    assert got[("b", 0.0)] == 0.0


def test_smoothing_pulls_to_prior(spark):
    # prior = 0.5; category 'rare' has one y=1 row
    df = _df(
        spark,
        [("x", 1.0), ("x", 0.0), ("rare", 1.0), ("x", 0.0), ("x", 1.0)],
    )
    enc = {
        r["cat"]: r["cat_te"]
        for r in target_encode(df, "cat", "y", smoothing=3.0).collect()
    }
    prior = 3.0 / 5
    assert abs(enc["rare"] - (1.0 + 3.0 * prior) / 4.0) < 1e-12
    # stronger smoothing -> closer to prior
    enc9 = {
        r["cat"]: r["cat_te"]
        for r in target_encode(df, "cat", "y", smoothing=30.0).collect()
    }
    assert abs(enc9["rare"] - prior) < abs(enc["rare"] - prior)


def test_loo_excludes_own_label(spark):
    df = _df(spark, [("a", 1.0), ("a", 0.0), ("a", 1.0)])
    got = sorted(
        (r["y"], r["cat_te"])
        for r in target_encode(df, "cat", "y", loo=True).collect()
    )
    # y=0 row: mean of (1,1) = 1.0; y=1 rows: mean of (1,0) = 0.5
    assert got == [(0.0, 1.0), (1.0, 0.5), (1.0, 0.5)]


def test_loo_singleton_null_without_smoothing(spark):
    df = _df(spark, [("solo", 1.0), ("x", 0.0), ("x", 1.0)])
    got = {
        r["cat"]: r["cat_te"]
        for r in target_encode(df, "cat", "y", loo=True).collect()
    }
    assert got["solo"] is None
    got_s = {
        r["cat"]: r["cat_te"]
        for r in target_encode(
            df, "cat", "y", loo=True, smoothing=2.0
        ).collect()
    }
    prior = 2.0 / 3
    assert abs(got_s["solo"] - prior) < 1e-12


def test_null_labels_excluded_but_encoded(spark):
    df = _df(spark, [("a", 1.0), ("a", None), ("a", 0.0)])
    got = [
        r["cat_te"] for r in target_encode(df, "cat", "y").collect()
    ]
    assert all(abs(v - 0.5) < 1e-12 for v in got)


def test_validation(spark):
    df = _df(spark, [("a", 1.0)])
    with pytest.raises(ValueError):
        target_encode(df, "cat", "y", smoothing=-1)
    with pytest.raises(ValueError):
        chi_squared(df, [], "y")
    with pytest.raises(ValueError):
        chi_squared(df, ["cat", "cat"], "y")


def _chi2_py(pairs):
    """Reference chi² over (v, y) pairs."""
    from collections import Counter

    obs = Counter(pairs)
    vs = sorted({v for v, _ in pairs})
    ys = sorted({y for _, y in pairs})
    n = len(pairs)
    rt = Counter(v for v, _ in pairs)
    ct = Counter(y for _, y in pairs)
    chi = 0.0
    for v in vs:
        for y in ys:
            e = rt[v] * ct[y] / n
            chi += (obs.get((v, y), 0) - e) ** 2 / e
    return chi, (len(vs) - 1) * (len(ys) - 1)


def test_chi_squared_matches_reference(spark):
    rows = [
        (("g1", "g2")[i % 2], ("u", "v", "w")[i % 3],
         ("p", "q")[(i * i) % 2])
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, schema="f1 string, f2 string, y string"
    )
    got = {
        r["feature"]: (r["chi2"], r["dof"], r["n"])
        for r in chi_squared(df, ["f1", "f2"], "y").collect()
    }
    for feat, idx in (("f1", 0), ("f2", 1)):
        ref, dof = _chi2_py([(r[idx], r[2]) for r in rows])
        assert abs(got[feat][0] - ref) < 1e-9, feat
        assert got[feat][1] == dof
        assert got[feat][2] == 60


def test_chi_squared_independent_vs_dependent(spark):
    rows = [
        (("a", "b")[i % 2], ("a", "b")[(i // 2) % 2])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        [(f, f, y) for (f, y) in rows],
        schema="dep string, indep0 string, y string",
    )
    # 'dep' IS the label column value; chi2 maximal (= n·dof)
    got = {
        r["feature"]: r["chi2"]
        for r in chi_squared(df, ["dep"], "dep").collect()
    }
    assert abs(got["dep"] - 40.0) < 1e-9


def test_chi_squared_null_category_stratum(spark):
    df = spark.createDataFrame(
        [(None, "p"), (None, "p"), ("a", "q"), ("a", "q")],
        schema="cat string, y string",
    )
    r = chi_squared(df, ["cat"], "y").collect()[0]
    assert r["n"] == 4 and r["dof"] == 1
    assert abs(r["chi2"] - 4.0) < 1e-9

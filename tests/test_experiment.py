"""A/B-test statistics: numpy-parity Welch t, hand-computed
proportions z, erf accuracy, CUPED variance reduction."""

import math

import numpy as np
import pytest

from qualityassurancetool_spark.operators.experiment import (
    cuped_adjust,
    two_proportion_z,
    welch_t_test,
)


def _welch_ref(a, b):
    na, nb = len(a), len(b)
    ma, mb = np.mean(a), np.mean(b)
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    p = math.erfc(abs(t) / math.sqrt(2))
    return t, dof, p


def test_welch_numpy_parity(spark):
    rng = np.random.default_rng(21)
    a = rng.normal(10.0, 2.0, 400)  # control
    b = rng.normal(10.4, 3.0, 300)  # treatment
    rows = [("c", float(v)) for v in a] + [
        ("t", float(v)) for v in b
    ]
    df = spark.createDataFrame(rows, ["variant", "y"])
    r = welch_t_test(df, "variant", "y", control="c").collect()[0]
    t, dof, p = _welch_ref(b, a)
    assert r["variant"] == "t"
    assert r["n_t"] == 300 and r["n_c"] == 400
    assert r["t_stat"] == pytest.approx(t, rel=1e-9)
    assert r["dof"] == pytest.approx(dof, rel=1e-9)
    # A-S erf approximation is good to ~1.5e-7
    assert r["p_value"] == pytest.approx(p, abs=1e-6)
    assert r["significant"] == (p < 0.05)


def test_welch_stratified_and_multi_variant(spark):
    rows = []
    for s, shift in (("us", 0.0), ("eu", 5.0)):
        for v, mu in (("c", 10.0), ("t1", 10.0), ("t2", 14.0)):
            for i in range(50):
                rows.append(
                    (s, v, shift + mu + (i % 7) * 0.1)
                )
    df = spark.createDataFrame(rows, ["region", "variant", "y"])
    out = {
        (r["region"], r["variant"]): r
        for r in welch_t_test(
            df, "variant", "y", control="c", by=["region"]
        ).collect()
    }
    assert set(out) == {
        ("us", "t1"), ("us", "t2"), ("eu", "t1"), ("eu", "t2")
    }
    for s in ("us", "eu"):
        assert out[(s, "t1")]["significant"] is False
        assert out[(s, "t2")]["significant"] is True
        assert out[(s, "t2")]["diff"] == pytest.approx(4.0)


def test_welch_degenerate_small_n(spark):
    df = spark.createDataFrame(
        [("c", 1.0), ("c", 2.0), ("t", 5.0)], ["variant", "y"]
    )
    r = welch_t_test(df, "variant", "y", control="c").collect()[0]
    assert r["t_stat"] is None and r["significant"] is None


def test_two_proportion_hand_computed(spark):
    # control: 40/200, treatment: 70/200
    rows = [("c", 1)] * 40 + [("c", 0)] * 160 + [
        ("t", 1)
    ] * 70 + [("t", 0)] * 130
    df = spark.createDataFrame(rows, ["variant", "ok"])
    r = two_proportion_z(df, "variant", "ok", control="c").collect()[0]
    p_pool = 110 / 400
    se = math.sqrt(p_pool * (1 - p_pool) * (1 / 200 + 1 / 200))
    z = (0.35 - 0.20) / se
    assert r["rate_t"] == pytest.approx(0.35)
    assert r["rate_c"] == pytest.approx(0.20)
    assert r["z_stat"] == pytest.approx(z, rel=1e-9)
    assert r["p_value"] == pytest.approx(
        math.erfc(z / math.sqrt(2)), abs=1e-6
    )
    assert r["significant"] is True


def test_two_proportion_zero_variance_null(spark):
    rows = [("c", 1)] * 10 + [("t", 1)] * 10
    df = spark.createDataFrame(rows, ["variant", "ok"])
    r = two_proportion_z(df, "variant", "ok", control="c").collect()[0]
    assert r["z_stat"] is None and r["significant"] is None


def test_cuped_reduces_variance(spark):
    rng = np.random.default_rng(5)
    x = rng.normal(100, 20, 2000)  # pre-period covariate
    noise = rng.normal(0, 5, 2000)
    y = 0.8 * x + noise  # strongly correlated metric
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"]
    )
    out = cuped_adjust(df, "y", "x")
    import pyspark.sql.functions as F

    r = out.agg(
        F.var_samp("y").alias("vy"),
        F.var_samp("y_cuped").alias("va"),
        F.avg("y").alias("my"),
        F.avg("y_cuped").alias("ma"),
    ).collect()[0]
    # same mean, much smaller variance (residual ~ noise variance)
    assert r["ma"] == pytest.approx(r["my"], rel=1e-9)
    assert r["va"] < 0.2 * r["vy"]


def test_cuped_null_covariate_keeps_raw(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 12.0), (None, 99.0), (3.0, 14.0)],
        "x double, y double",
    )
    out = {r["y"]: r["y_cuped"] for r in cuped_adjust(df, "y", "x").collect()}
    assert out[99.0] == 99.0


def test_cuped_zero_variance_no_adjustment(spark):
    df = spark.createDataFrame(
        [(5.0, 1.0), (5.0, 2.0), (5.0, 3.0)], "x double, y double"
    )
    out = cuped_adjust(df, "y", "x").collect()
    for r in out:
        assert r["y_cuped"] == r["y"]


def test_validation(spark):
    df = spark.createDataFrame([("c", 1.0)], ["variant", "y"])
    with pytest.raises(ValueError):
        welch_t_test(df, "variant", "y", "c", alpha=0.0)
    with pytest.raises(ValueError):
        two_proportion_z(df, "variant", "y", "c", alpha=1.0)


def test_stratum_without_control_dropped(spark):
    # the control stats attach via a per-stratum window; a stratum
    # with no control row must vanish exactly like the former inner
    # join dropped it (round-11 optimization regression net)
    rows = (
        [("us", "c", 1.0), ("us", "c", 2.0), ("us", "t", 5.0),
         ("us", "t", 6.0)]
        + [("eu", "t", 3.0), ("eu", "t", 4.0)]  # no control in eu
    )
    df = spark.createDataFrame(rows, ["region", "variant", "y"])
    out = welch_t_test(
        df, "variant", "y", control="c", by=["region"]
    ).collect()
    assert [(r["region"], r["variant"]) for r in out] == [("us", "t")]
    zrows = (
        [("us", "c", 1), ("us", "t", 0)] + [("eu", "t", 1)]
    )
    zdf = spark.createDataFrame(zrows, ["region", "variant", "ok"])
    zout = two_proportion_z(
        zdf, "variant", "ok", control="c", by=["region"]
    ).collect()
    assert [(r["region"], r["variant"]) for r in zout] == [("us", "t")]


def test_null_stratum_dropped_like_inner_join(spark):
    # round-11 advisor: the old inner join on the `by` columns dropped
    # strata whose group value is NULL (SQL join null-inequality);
    # Window.partitionBy groups NULLs together, so the window-based
    # control attach must filter them explicitly to keep join parity
    rows = (
        [("us", "c", 1.0), ("us", "c", 2.0), ("us", "t", 5.0),
         ("us", "t", 6.0)]
        + [(None, "c", 1.0), (None, "c", 2.0), (None, "t", 3.0),
           (None, "t", 4.0)]  # NULL stratum has control AND treatment
    )
    df = spark.createDataFrame(rows, ["region", "variant", "y"])
    out = welch_t_test(
        df, "variant", "y", control="c", by=["region"]
    ).collect()
    assert [(r["region"], r["variant"]) for r in out] == [("us", "t")]
    zrows = (
        [("us", "c", 1), ("us", "c", 0), ("us", "t", 0), ("us", "t", 1)]
        + [(None, "c", 1), (None, "t", 0)]
    )
    zdf = spark.createDataFrame(zrows, ["region", "variant", "ok"])
    zout = two_proportion_z(
        zdf, "variant", "ok", control="c", by=["region"]
    ).collect()
    assert [(r["region"], r["variant"]) for r in zout] == [("us", "t")]

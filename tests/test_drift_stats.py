"""Dataset-shift statistics (operators/drift_stats): hand-computed
PSI, identical-distribution near-zero, planted-shift detection,
epsilon smoothing on empty bins, categorical alignment with unseen
categories."""

import math
import random

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.drift_stats import (
    categorical_stability,
    population_stability,
)


def _df(spark, values, col="x"):
    return spark.createDataFrame(
        [(float(v),) for v in values], f"{col} double"
    )


def test_hand_computed_two_bins(spark):
    # ref: 0..99 -> median cut 49.5; new shifted so 70% falls above
    ref = _df(spark, range(100))
    new = _df(spark, list(range(35, 100)) + list(range(80, 115)))
    out = population_stability(ref, new, ["x"], n_bins=2).collect()[0]
    # ref: p=(0.5, 0.5); new: below 49.5 -> 35..49 = 15 of 100
    p_ref, p_new = (0.5, 0.5), (0.15, 0.85)
    want = sum(
        (pn - pr) * math.log(pn / pr)
        for pn, pr in zip(p_new, p_ref)
    )
    assert out["psi"] == pytest.approx(want, rel=1e-9)
    want_kl = sum(
        pn * math.log(pn / pr) for pn, pr in zip(p_new, p_ref)
    )
    assert out["kl"] == pytest.approx(want_kl, rel=1e-9)
    assert out["n_ref"] == 100 and out["n_new"] == 100


def test_stable_vs_shifted(spark):
    rng = random.Random(7)
    ref = _df(spark, [rng.gauss(50, 10) for _ in range(4000)])
    same = _df(spark, [rng.gauss(50, 10) for _ in range(4000)])
    moved = _df(spark, [rng.gauss(58, 10) for _ in range(4000)])
    stable = population_stability(ref, same, ["x"]).collect()[0]
    shifted = population_stability(ref, moved, ["x"]).collect()[0]
    assert stable["psi"] < 0.05  # conventional 'no shift' band
    assert shifted["psi"] > 0.25  # conventional 'shifted' threshold
    assert shifted["kl"] > stable["kl"]


def test_empty_bin_epsilon_not_inf(spark):
    ref = _df(spark, range(100))
    new = _df(spark, range(50))  # upper bins empty on the new side
    out = population_stability(
        ref, new, ["x"], n_bins=4
    ).collect()[0]
    assert math.isfinite(out["psi"]) and math.isfinite(out["kl"])
    assert out["psi"] > 0.25


def test_multi_column_one_call_and_nulls(spark):
    rows = [
        (float(i), float(i % 10), None if i % 5 == 0 else 1.0)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = {
        r["col"]: r
        for r in population_stability(df, df, ["a", "b", "c"]).collect()
    }
    assert set(out) == {"a", "b", "c"}
    for r in out.values():
        assert r["psi"] == pytest.approx(0.0, abs=1e-12)
    assert out["c"]["n_ref"] == 160  # NULLs excluded from both sides


def test_categorical_unseen_folds_to_other(spark):
    ref = spark.createDataFrame(
        [("a",)] * 70 + [("b",)] * 30, "k string"
    )
    new = spark.createDataFrame(
        [("a",)] * 40 + [("b",)] * 30 + [("zzz",)] * 30, "k string"
    )
    rows = categorical_stability(ref, new, "k").collect()
    per = {r["category"]: r for r in rows if r["category"] is not None}
    total = next(r for r in rows if r["category"] is None)
    assert per["__other__"]["p_new"] == pytest.approx(0.3)
    assert per["a"]["p_ref"] == pytest.approx(0.7)
    # manual PSI with eps=1e-4 on the empty ref-__other__ cell
    e = 1e-4
    want = sum(
        (pn - pr) * math.log(pn / pr)
        for pn, pr in [(0.4, 0.7), (0.3, 0.3), (0.3, e)]
    )
    assert total["psi_term"] == pytest.approx(want, rel=1e-9)
    # kl_term: emitted per category AND summed in the total row
    want_kl = sum(
        pn * math.log(pn / pr)
        for pn, pr in [(0.4, 0.7), (0.3, 0.3), (0.3, e)]
    )
    assert total["kl_term"] == pytest.approx(want_kl, rel=1e-9)
    assert per["a"]["kl_term"] == pytest.approx(
        0.4 * math.log(0.4 / 0.7), rel=1e-9
    )


def test_categorical_sentinel_collision_raises(spark):
    ref = spark.createDataFrame([("a",), ("__other__",)], "k string")
    new = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="__other__"):
        categorical_stability(ref, new, "k")
    ref2 = spark.createDataFrame([("a",)], "k string")
    new2 = spark.createDataFrame([("__null__",), ("a",)], "k string")
    with pytest.raises(ValueError, match="__null__"):
        categorical_stability(ref2, new2, "k")


def test_validation(spark):
    df = _df(spark, [1.0])
    with pytest.raises(ValueError):
        population_stability(df, df, [])
    with pytest.raises(ValueError):
        population_stability(df, df, ["x", "x"])
    with pytest.raises(ValueError):
        population_stability(df, df, ["x"], n_bins=1)
    with pytest.raises(ValueError):
        categorical_stability(df, df, "x", max_categories=0)


def test_psi_cli(spark, tmp_path, capsys):
    from qualityassurancetool_spark.cli import main

    ref, new = str(tmp_path / "ref"), str(tmp_path / "new")
    spark.range(2000).selectExpr(
        "cast(id % 50 as double) as a",
        "cast(id % 3 as string) as k",
    ).write.parquet(ref)
    spark.range(2000).selectExpr(
        "cast((id % 50) + 10 as double) as a",
        "cast(id % 4 as string) as k",
    ).write.parquet(new)
    out = str(tmp_path / "out")
    rc = main([
        "profile", "--keep-session", f"data.input={new}",
        f"data.out={out}", "method=psi", f"ref={ref}", "cols=[a]",
    ])
    assert rc == 0
    got = spark.read.parquet(out).collect()[0]
    assert got["col"] == "a" and got["psi"] > 0.25
    out2 = str(tmp_path / "out2")
    rc = main([
        "profile", "--keep-session", f"data.input={new}",
        f"data.out={out2}", "method=psi", f"ref={ref}", "category=k",
    ])
    assert rc == 0
    cats = {
        r["category"] for r in spark.read.parquet(out2).collect()
    }
    assert "__other__" in cats
    assert main([
        "profile", "--keep-session", f"data.input={new}",
        f"data.out={out}", "method=psi",
    ]) != 0
    capsys.readouterr()


def test_approx_mode_agrees(spark):
    rng = random.Random(31)
    ref = _df(spark, [rng.gauss(50, 10) for _ in range(4000)])
    new = _df(spark, [rng.gauss(55, 10) for _ in range(4000)])
    exact = population_stability(ref, new, ["x"]).collect()[0]
    ap = population_stability(
        ref, new, ["x"], approx=True
    ).collect()[0]
    # sketch cut-points shift bin edges slightly; the statistic's
    # magnitude and verdict agree
    assert ap["psi"] == pytest.approx(exact["psi"], rel=0.15)
    assert (ap["psi"] > 0.1) == (exact["psi"] > 0.1)

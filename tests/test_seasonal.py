"""Seasonal-profile z-score (operators/seasonal): hand-computed cell
stats, cyclic-signal discrimination vs a global z-score, LOO leakage
guard, history-baseline scoring, null/min-sample discipline."""

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.seasonal import (
    seasonal_profile,
    seasonal_zscore,
)

T0 = dt.datetime(2024, 1, 1)  # a Monday


def _df(spark, rows):
    """rows = [(group, hours_offset_float, value)]"""
    return spark.createDataFrame(
        [
            (
                g,
                None
                if off is None
                else T0 + dt.timedelta(hours=off),
                None if v is None else float(v),
            )
            for g, off, v in rows
        ],
        "g string, ts timestamp, x double",
    )


def test_hand_computed_cell_stats(spark):
    # hour 3 across 6 days: values 10,12,14,10,12,14
    rows = [
        ("s", 24 * d + 3, v)
        for d, v in enumerate([10, 12, 14, 10, 12, 14])
    ]
    prof = {
        r["cell"]: r
        for r in seasonal_profile(
            _df(spark, rows), "x", "ts", ["g"]
        ).collect()
    }
    assert prof[3]["n"] == 6
    assert prof[3]["sum_x"] == pytest.approx(72.0)
    out = seasonal_zscore(
        _df(spark, rows), "x", "ts", ["g"], min_samples=5
    ).collect()
    vals = [10, 12, 14, 10, 12, 14]
    m = sum(vals) / 6
    sd = math.sqrt(sum((v - m) ** 2 for v in vals) / 5)
    for r in out:
        assert r["seasonal_mu"] == pytest.approx(m)
        assert r["seasonal_sigma"] == pytest.approx(sd)
        assert r["seasonal_flag"] is False


def test_cyclic_signal_global_zscore_fails_seasonal_works(spark):
    """A clean diurnal sine + one planted 3am spike: the global
    z-score can't separate the spike from the daily peaks; the
    seasonal chart flags ONLY the spike."""
    rng = random.Random(9)
    rows = []
    for d in range(20):
        for h in range(24):
            base = 50 + 30 * math.sin(2 * math.pi * h / 24)
            rows.append(("s", 24.0 * d + h, base + rng.gauss(0, 1)))
    rows.append(("s", 24.0 * 20 + 3, 50 + 30 * math.sin(
        2 * math.pi * 3 / 24) + 25))  # spike in its own cell terms
    df = _df(spark, rows)
    out = seasonal_zscore(df, "x", "ts", ["g"], nsigma=4.0)
    flagged = [
        (r["ts"], r["x"]) for r in out.collect() if r["seasonal_flag"]
    ]
    assert len(flagged) == 1
    assert flagged[0][0].hour == 3
    # the global z-score never sees it: spike is within the daily swing
    g = df.agg(
        F.avg("x").alias("m"), F.stddev_samp("x").alias("s")
    ).collect()[0]
    spike = max(r[2] for r in rows)
    assert abs(spike - g["m"]) < 3.0 * g["s"]


def test_loo_excludes_own_value(spark):
    # 5 quiet points + 1 extreme in the same cell: with the extreme IN
    # its own baseline the cell sigma explodes and nothing flags; LOO
    # restores the quiet baseline and flags it
    rows = [("s", 24 * d + 7, 10.0 + 0.1 * d) for d in range(5)]
    rows.append(("s", 24 * 5 + 7, 50.0))
    df = _df(spark, rows)
    plain = seasonal_zscore(df, "x", "ts", ["g"], nsigma=3.0)
    assert plain.where(F.col("seasonal_flag")).count() == 0
    loo = seasonal_zscore(df, "x", "ts", ["g"], nsigma=3.0, loo=True)
    hit = loo.where(F.col("seasonal_flag")).collect()
    assert len(hit) == 1 and hit[0]["x"] == 50.0


def test_history_baseline_scoring(spark):
    hist = _df(
        spark, [("s", 24 * d + 12, 20.0 + (d % 3)) for d in range(9)]
    )
    prof = seasonal_profile(hist, "x", "ts", ["g"])
    new = _df(spark, [("s", 24 * 30 + 12, 21.0), ("s", 24 * 30 + 36, 90.0)])
    out = {
        r["x"]: r["seasonal_flag"]
        for r in seasonal_zscore(
            new, "x", "ts", ["g"], baseline=prof, min_samples=5
        ).collect()
    }
    assert out[21.0] is False
    assert out[90.0] is True


def test_null_and_min_sample_discipline(spark):
    rows = [("s", 24 * d + 5, 10.0) for d in range(3)]  # only 3 samples
    rows += [("s", None, 10.0), ("s", 24 * 9 + 5, None)]
    out = seasonal_zscore(
        _df(spark, rows), "x", "ts", ["g"], min_samples=5
    ).collect()
    assert all(r["seasonal_flag"] is None for r in out)
    # constant cell with enough samples: FP residue must not flag
    rows = [("s", 24 * d + 5, 0.1) for d in range(8)]
    out = seasonal_zscore(
        _df(spark, rows), "x", "ts", ["g"], min_samples=5
    ).collect()
    assert all(r["seasonal_flag"] is False for r in out)


def test_null_group_stratum_and_periods(spark):
    rows = [(None, 24 * d + 2, 5.0 + d % 2) for d in range(8)]
    out = seasonal_zscore(
        _df(spark, rows), "x", "ts", ["g"], min_samples=5
    ).collect()
    assert all(r["seasonal_flag"] is False for r in out)
    df = _df(spark, [("s", 1.0, 1.0)])
    for p in ("day_of_week", "hour_of_week", "month"):
        assert (
            seasonal_zscore(df, "x", "ts", ["g"], period=p).count()
            == 1
        )
    with pytest.raises(ValueError):
        seasonal_zscore(df, "x", "ts", ["g"], period="nope")
    with pytest.raises(ValueError):
        seasonal_zscore(df, "x", "ts", ["g"], nsigma=0)
    with pytest.raises(ValueError):
        seasonal_zscore(df, "x", "ts", ["g"], min_samples=1)

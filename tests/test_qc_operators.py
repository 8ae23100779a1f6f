"""Operator unit tests transliterating the reference's own fixtures:
strict range (tests/test_qc.py:658-668), np.gradient parity
(tests/test_qc.py:446-510), stabilization golden frame
(tests/test_qc.py:542-601), rolling z-score outliers
(tests/test_qc.py:671-679)."""

import datetime as dt

import numpy as np
import pyspark.sql.functions as F
import pytest

from qualityassurancetool_spark.flags import QualityFlags
from qualityassurancetool_spark.operators.gradient import calc_gradient
from qualityassurancetool_spark.operators.range_check import (
    in_range_bool,
    out_of_range_bool,
)
from qualityassurancetool_spark.operators.stabilization import apply_stabilization
from qualityassurancetool_spark.operators.zscore import calc_zscore

T0 = dt.datetime(2023, 1, 1)


def ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def test_strict_range_endpoints_flagged(spark):
    # results i*2.345 for stream 0, thresholds (2.0, 9.2): rows 0 and 4 out
    rows = [(i, i * 2.345, 2.0, 9.2) for i in range(5)]
    df = spark.createDataFrame(
        rows, "iot_id long, result double, mn double, mx double"
    ).select(
        "iot_id",
        out_of_range_bool(F.col("result"), F.col("mn"), F.col("mx")).alias("b"),
    )
    got = {r["iot_id"]: r["b"] for r in df.collect()}
    assert got == {0: True, 1: False, 2: False, 3: False, 4: True}


def test_range_null_threshold_gives_null(spark):
    df = spark.createDataFrame(
        [(1.0, None, 5.0)], "v double, mn double, mx double"
    ).select(in_range_bool(F.col("v"), F.col("mn"), F.col("mx")).alias("b"))
    assert df.collect()[0]["b"] is None


@pytest.mark.parametrize("uniform", [True, False])
def test_gradient_matches_np_gradient(spark, uniform):
    rng = np.random.default_rng(42)
    if uniform:
        t = np.arange(0.0, 60.0, 3.0)
    else:
        # round to whole microseconds: Spark timestamps are µs-precision
        t = np.round(np.sort(rng.uniform(0, 60, 20)), 6)
    f = np.cumsum(rng.normal(0, 1, t.size)) + 5.0
    expected = np.gradient(f, t)

    rows = [
        (int(i), float(f[i]), ts(float(t[i])), 7)
        for i in range(t.size)
    ]
    df = spark.createDataFrame(
        rows, "iot_id long, result double, phenomenon_time timestamp, datastream_id long"
    )
    out = (
        calc_gradient(df)
        .orderBy("iot_id")
        .select("gradient")
        .collect()
    )
    got = np.array([r["gradient"] for r in out])
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)


def test_gradient_multi_group_and_singleton(spark):
    rows = [
        (0, 1.0, ts(0), 1),
        (1, 2.0, ts(10), 1),
        (2, 4.0, ts(20), 1),
        (3, 9.9, ts(5), 2),  # singleton group -> null
    ]
    df = spark.createDataFrame(
        rows, "iot_id long, result double, phenomenon_time timestamp, datastream_id long"
    )
    got = {r["iot_id"]: r["gradient"] for r in calc_gradient(df).collect()}
    expected = np.gradient(np.array([1.0, 2.0, 4.0]), np.array([0.0, 10.0, 20.0]))
    assert got[3] is None
    np.testing.assert_allclose([got[0], got[1], got[2]], expected, rtol=1e-9)


def test_stabilization_golden_frame(spark):
    # reference tests/test_qc.py:542-601 golden values
    hours = 3600.0
    rows = [
        (i, float(i + 1), ts(i * hours), 1.0, 6.0, 1 * hours, 2 * hours, 1)
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows,
        "iot_id long, result double, phenomenon_time timestamp, "
        "qc_range_min double, qc_range_max double, "
        "max_allowed_downtime double, dt_stabilization double, datastream_id long",
    )
    out = apply_stabilization(df).orderBy("iot_id").collect()

    assert [r["within_limits"] for r in out] == [False, True, True, True, True]
    assert [r["dt"] for r in out] == [0.0, hours, hours, hours, hours]
    assert [r["cumsum"] for r in out] == [0.0, hours, 2 * hours, 3 * hours, 4 * hours]
    assert [r["time_down"] for r in out] == [0.0] * 5
    assert [r["time_up_since"] for r in out] == [
        0.0,
        hours,
        2 * hours,
        3 * hours,
        4 * hours,
    ]
    assert [r["block_id"] for r in out] == [1, 2, 2, 2, 2]
    assert [r["max_downtime"] for r in out] == [0.0] * 5
    assert [r["stabilization_flag"] for r in out] == [4, 4, 0, 0, 0]


def test_stabilization_downtime_blocks(spark):
    # a mid-series down block: verify time_down accumulates and resets,
    # and max_downtime propagates within the down block only
    hours = 3600.0
    results = [5.0, 9.9, 9.9, 5.0, 5.0]  # rows 1,2 out of (1, 6)
    rows = [
        (i, results[i], ts(i * hours), 1.0, 6.0, 0.5 * hours, 0.0, 1)
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows,
        "iot_id long, result double, phenomenon_time timestamp, "
        "qc_range_min double, qc_range_max double, "
        "max_allowed_downtime double, dt_stabilization double, datastream_id long",
    )
    out = apply_stabilization(df).orderBy("iot_id").collect()
    assert [r["within_limits"] for r in out] == [True, False, False, True, True]
    assert [r["time_down"] for r in out] == [0.0, hours, 2 * hours, 0.0, 0.0]
    assert [r["block_id"] for r in out] == [1, 2, 2, 3, 3]
    assert [r["max_downtime"] for r in out] == [0.0, 2 * hours, 2 * hours, 0.0, 0.0]


def test_zscore_rolling_trailing_window(spark):
    # constant series with one spike: spike's z is large; pandas-parity
    # trailing 60min window, sample stddev
    import pandas as pd

    vals = [10.0] * 30
    vals[20] = 100.0
    times = [ts(i * 60.0) for i in range(30)]
    rows = [(i, vals[i], times[i], 1) for i in range(30)]
    df = spark.createDataFrame(
        rows, "iot_id long, result double, phenomenon_time timestamp, datastream_id long"
    )
    out = calc_zscore(df, rolling_time_window="10min").orderBy("iot_id").collect()

    pdf = pd.DataFrame({"result": vals}, index=pd.DatetimeIndex(times))
    # closed [t-Δ, t] to match the engine frame
    roll = pdf.rolling("600s", closed="both")
    mu, sd = roll.mean()["result"], roll.std()["result"]
    expected = (pdf["result"] - mu) / sd
    for i, r in enumerate(out):
        e = expected.iloc[i]
        if np.isnan(e) or np.isinf(e):
            assert r["zscore"] is None or np.isnan(r["zscore"]) or np.isinf(r["zscore"])
        else:
            assert r["zscore"] == pytest.approx(e, rel=1e-9)

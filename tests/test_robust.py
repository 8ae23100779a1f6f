"""Median/MAD robust outlier scoring (operators/robust).
Cross-engine parity: tools/extra_oracles.py::x_robust_outlier."""

import statistics

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.robust import (
    MAD_CONSISTENCY,
    robust_outlier_flags,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["id", "g", "v"])


def test_matches_statistics_median_reference(spark):
    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 9.5, 300.0]
    df = _df(spark, [(i, "a", v) for i, v in enumerate(vals)])
    got = {r["id"]: r for r in robust_outlier_flags(df, "v", "g").collect()}
    med = statistics.median(vals)
    mad = statistics.median([abs(v - med) for v in vals])
    for i, v in enumerate(vals):
        assert got[i]["group_median"] == pytest.approx(med)
        assert got[i]["group_mad"] == pytest.approx(mad)
        assert got[i]["robust_z"] == pytest.approx(
            (v - med) / (MAD_CONSISTENCY * mad)
        )
    # only the spike flags
    assert {i for i, r in got.items() if r["is_outlier"]} == {6}


def test_robust_to_contamination_where_zscore_is_not(spark):
    # two spikes: the first inflates std enough that a 3.5-sigma zscore
    # misses the second, but MAD flags both
    vals = [10.0 + 0.1 * i for i in range(20)] + [1000.0, 900.0]
    df = _df(spark, [(i, "a", v) for i, v in enumerate(vals)])
    out = robust_outlier_flags(df, "v", "g").collect()
    flagged = {r["id"] for r in out if r["is_outlier"]}
    assert flagged == {20, 21}
    # classical z-score on the same data misses the 900 spike
    import statistics as st

    mu, sd = st.mean(vals), st.pstdev(vals)
    assert abs((900.0 - mu) / sd) < 3.5


def test_constant_group_and_nulls(spark):
    df = spark.createDataFrame(
        [(0, "c", 5.0), (1, "c", 5.0), (2, "c", 5.0), (3, "c", None)],
        ["id", "g", "v"],
    )
    got = {r["id"]: r for r in robust_outlier_flags(df, "v", "g").collect()}
    assert all(r["group_mad"] == 0.0 for r in got.values())
    assert all(r["robust_z"] is None for r in got.values())
    assert all(r["is_outlier"] is False for r in got.values())


def test_groups_are_independent(spark):
    df = _df(
        spark,
        [(i, "a", float(i % 5)) for i in range(20)]
        + [(100 + i, "b", 1000.0 + (i % 3)) for i in range(20)],
    )
    out = robust_outlier_flags(df, "v", "g").collect()
    # group b's huge values are NOT outliers within their own group
    assert not any(r["is_outlier"] for r in out)


def test_winsorize_clips_and_preserves_rows(spark):
    from qualityassurancetool_spark.operators.robust import winsorize

    rows = [(i, "g", float(i)) for i in range(1, 100)] + [
        (100, "g", 10_000.0),     # wild outlier clipped to p99
        (101, None, 10_000.0),    # null group: passes through UNCLIPPED
        (102, "g", None),         # null value stays null
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = {
        r["id"]: r["v_wins"]
        for r in winsorize(df, "v", "grp").collect()
    }
    assert len(out) == 102  # transformation, not a filter
    assert out[100] < 10_000.0          # clipped down to the group p99
    assert out[101] == 10_000.0         # null group untouched
    assert out[102] is None
    assert out[50] == 50.0              # interior values unchanged
    # global mode
    outg = {
        r["id"]: r["v_wins"]
        for r in winsorize(df, "v", None, 0.0, 0.5).collect()
    }
    assert outg[100] <= 51.0            # clipped to the global median
    import pytest as _pytest

    with _pytest.raises(ValueError):
        winsorize(df, "v", "grp", 0.9, 0.1)

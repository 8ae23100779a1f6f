"""Bucketed-overlap scale path must agree row-for-row with the pure-Window
implementations (same frames, same stats) — the halo replication and
native-row trimming must be invisible in results."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.partitioned_windows import (
    bucketed_time_rolling,
    calc_zscore_bucketed,
    median_track_bucketed,
)
from qualityassurancetool_spark.operators.spatial_outlier import with_median_track
from qualityassurancetool_spark.operators.zscore import calc_zscore
from qualityassurancetool_spark.schema import events_as_observations

SF_DIR = "/root/testdata/sf0.001"


def _collect_map(df, key, val):
    rows = df.select(key, val).collect()
    return {r[0]: r[1] for r in rows}


def _assert_equal_maps(a, b):
    assert set(a) == set(b)
    for k, va in a.items():
        vb = b[k]
        if va is None or (isinstance(va, float) and math.isnan(va)):
            assert vb is None or (isinstance(vb, float) and math.isnan(vb)), k
        else:
            assert vb == pytest.approx(va, rel=1e-9, abs=1e-9), k


@pytest.mark.parametrize("strategy", ["window", "pandas"])
def test_zscore_bucketed_matches_window(spark, strategy):
    obs = events_as_observations(spark, SF_DIR)
    ref = calc_zscore(obs, group_col="observation_type", rolling_time_window="60min")
    # small bucket (2x window) to force many buckets and heavy halo use
    got = calc_zscore_bucketed(
        obs,
        group_col="observation_type",
        rolling_time_window="60min",
        bucket="120min",
        strategy=strategy,
    )
    _assert_equal_maps(
        _collect_map(ref, "iot_id", "zscore"), _collect_map(got, "iot_id", "zscore")
    )


@pytest.mark.parametrize("strategy", ["window", "pandas"])
def test_median_track_bucketed_matches_window(spark, strategy):
    obs = events_as_observations(spark, SF_DIR)
    ref = with_median_track(
        obs, time_window="10min", partition_cols=["observation_type"]
    )
    got = median_track_bucketed(
        obs,
        time_window="10min",
        partition_cols=["observation_type"],
        bucket="30min",
        strategy=strategy,
    )
    for c in ["median_lat", "median_long"]:
        _assert_equal_maps(
            _collect_map(ref, "iot_id", c), _collect_map(got, "iot_id", c)
        )


def test_bucketed_emits_each_row_exactly_once(spark):
    obs = events_as_observations(spark, SF_DIR)
    out = bucketed_time_rolling(
        obs,
        specs={"n_in_win": ("result", "count")},
        partition_cols=["observation_type"],
        before="30min",
        after="30min",
        bucket="45min",
    )
    assert out.count() == obs.count()
    assert out.select("iot_id").distinct().count() == obs.count()
    # every window contains at least the row itself
    assert out.where(F.col("n_in_win") < 1).count() == 0


def test_bucketed_rejects_bad_stat(spark):
    obs = events_as_observations(spark, SF_DIR)
    with pytest.raises(ValueError):
        bucketed_time_rolling(obs, specs={"x": ("result", "sum")})


def test_null_timestamp_rows_are_kept_with_null_stats(spark):
    """NULL-timestamp rows must not vanish in the bucket explode (review
    finding): both strategies return them with null stats — 'no
    timestamp, no window', and row counts match the input."""
    import datetime as dt

    from qualityassurancetool_spark.operators.partitioned_windows import (
        bucketed_time_rolling,
    )

    rows = [
        (1, "a", dt.datetime(2024, 1, 1, 0, 0, 0), 10.0),
        (2, "a", dt.datetime(2024, 1, 1, 0, 1, 0), 20.0),
        (3, "a", None, 30.0),
    ]
    df = spark.createDataFrame(
        rows, "iot_id long, datastream_id string, "
              "phenomenon_time timestamp, result double"
    )
    for strategy in ("window", "pandas"):
        out = bucketed_time_rolling(
            df,
            {"mu": ("result", "mean"), "n": ("result", "count")},
            before="5min",
            strategy=strategy,
        )
        got = {r["iot_id"]: (r["mu"], r["n"]) for r in out.collect()}
        assert set(got) == {1, 2, 3}, strategy
        assert got[3] == (None, None), strategy
        assert got[2][0] == 15.0 and got[2][1] == 2


def test_null_ts_parity_between_plain_and_bucketed(spark):
    """Advisor (r4, medium): with >=2 NULL-timestamp rows in a stream,
    Spark's RANGE window puts them all in one all-NULLs peer frame, so
    the plain path used to emit non-null mu/sd there while the bucketed
    twin emitted NULL — the knob changed QC flags.  The pinned semantic
    is 'no timestamp, no window' in BOTH paths."""
    import datetime as dt

    rows = [
        (1, "a", dt.datetime(2024, 1, 1, 0, 0, 0), 10.0, 51.0, 3.0),
        (2, "a", dt.datetime(2024, 1, 1, 0, 1, 0), 20.0, 51.1, 3.1),
        (3, "a", None, 30.0, 51.2, 3.2),
        (4, "a", None, 40.0, 51.3, 3.3),  # 2nd null-ts row => non-trivial null frame
        (5, "b", None, 50.0, 51.4, 3.4),
    ]
    df = spark.createDataFrame(
        rows,
        "iot_id long, datastream_id string, phenomenon_time timestamp, "
        "result double, lat double, long double",
    )
    ref = calc_zscore(df, rolling_time_window="5min")
    got = calc_zscore_bucketed(df, rolling_time_window="5min")
    _assert_equal_maps(
        _collect_map(ref, "iot_id", "zscore"),
        _collect_map(got, "iot_id", "zscore"),
    )
    # null-ts rows specifically must be NULL in the plain path too
    assert all(
        r["zscore"] is None
        for r in ref.where(F.col("phenomenon_time").isNull()).collect()
    )
    m_ref = with_median_track(
        df, time_window="4min", partition_cols=["datastream_id"]
    )
    m_got = median_track_bucketed(
        df, time_window="4min", partition_cols=["datastream_id"]
    )
    for c in ["median_lat", "median_long"]:
        _assert_equal_maps(
            _collect_map(m_ref, "iot_id", c), _collect_map(m_got, "iot_id", c)
        )

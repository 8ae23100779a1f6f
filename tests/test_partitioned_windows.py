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


def test_gradient_bucketed_matches_plain(spark):
    """np.gradient-parity twin: boundary-halo bucketing must reproduce
    the per-stream lag/lead window exactly, including bucket-edge rows
    and null-timestamp rows (NULL in both)."""
    import datetime as dt

    from qualityassurancetool_spark.operators.gradient import calc_gradient
    from qualityassurancetool_spark.operators.partitioned_windows import (
        calc_gradient_bucketed,
    )

    obs = events_as_observations(spark, SF_DIR)
    ref = calc_gradient(
        obs, group_col="observation_type", order_extra=["iot_id"]
    )
    # tiny bucket (5 min) so nearly every neighbor pair crosses a boundary
    got = calc_gradient_bucketed(
        obs, group_col="observation_type", order_extra=["iot_id"],
        bucket="5min",
    )
    _assert_equal_maps(
        _collect_map(ref, "iot_id", "gradient"),
        _collect_map(got, "iot_id", "gradient"),
    )
    # null-ts rows and single-row streams
    rows = [
        (1, "a", dt.datetime(2024, 1, 1, 0, 0, 0), 10.0),
        (2, "a", dt.datetime(2024, 1, 1, 0, 1, 0), 20.0),
        (3, "a", dt.datetime(2024, 1, 1, 2, 0, 0), 50.0),  # far gap
        (4, "a", None, 30.0),
        (5, "b", dt.datetime(2024, 1, 1, 0, 0, 0), 1.0),   # singleton
    ]
    df = spark.createDataFrame(
        rows, "iot_id long, datastream_id string, "
              "phenomenon_time timestamp, result double"
    )
    ref2 = calc_gradient(df, order_extra=["iot_id"])
    got2 = calc_gradient_bucketed(df, order_extra=["iot_id"], bucket="30min")
    _assert_equal_maps(
        _collect_map(ref2, "iot_id", "gradient"),
        _collect_map(got2, "iot_id", "gradient"),
    )


def test_stabilization_bucketed_matches_plain(spark):
    """W1–W4 prefix-scan twin: the two-phase scan (bucket carries +
    local windows) must reproduce the sequential per-stream windows —
    cumsum/time_down/time_up_since to 1e-6 s (FP association order
    differs), block_id/max_downtime/flag exactly."""
    from qualityassurancetool_spark.operators.stabilization import (
        apply_stabilization,
    )

    obs = events_as_observations(spark, SF_DIR).select(
        "iot_id", "observation_type", "phenomenon_time", "result",
        F.lit(1.0).alias("qc_range_min"),
        F.lit(250.0).alias("qc_range_max"),
        F.lit(600.0).alias("max_allowed_downtime"),
        F.lit(120.0).alias("dt_stabilization"),
    )
    ref = apply_stabilization(obs, group_cols=["observation_type"])
    got = apply_stabilization(
        obs, group_cols=["observation_type"], strategy="bucketed"
    )
    # tiny bucket to exercise carries heavily
    from qualityassurancetool_spark.operators.partitioned_windows import (
        apply_stabilization_bucketed,
    )

    got_small = apply_stabilization_bucketed(
        obs, group_cols=["observation_type"], bucket="30min"
    )
    r = {x["iot_id"]: x for x in ref.collect()}
    for name, out in [("default", got), ("30min", got_small)]:
        g = {x["iot_id"]: x for x in out.collect()}
        assert set(g) == set(r), name
        for k, rv in r.items():
            gv = g[k]
            assert gv["within_limits"] == rv["within_limits"], (name, k)
            assert gv["block_id"] == rv["block_id"], (name, k)
            assert gv[
                "stabilization_flag"
            ] == rv["stabilization_flag"], (name, k)
            for c in ("dt", "cumsum", "time_down", "time_up_since",
                      "max_downtime"):
                assert gv[c] == pytest.approx(rv[c], abs=1e-6), (name, k, c)


def test_stabilization_null_ts_rows_get_null_stats(spark):
    """'No timestamp, no stats' in BOTH strategies: null-ts rows keep
    within_limits (row-local) but all time-derived columns and the flag
    are NULL, and they do not shift block numbering of real rows."""
    import datetime as dt

    from qualityassurancetool_spark.operators.stabilization import (
        apply_stabilization,
    )

    rows = [
        (1, "a", dt.datetime(2024, 1, 1, 0, 0, 0), 10.0),
        (2, "a", None, 400.0),            # out of range, no timestamp
        (3, "a", dt.datetime(2024, 1, 1, 0, 1, 0), 300.0),
        (4, "a", dt.datetime(2024, 1, 1, 0, 2, 0), 20.0),
    ]
    df = spark.createDataFrame(
        rows, "iot_id long, datastream_id string, "
              "phenomenon_time timestamp, result double"
    ).withColumns(
        {
            "qc_range_min": F.lit(1.0),
            "qc_range_max": F.lit(250.0),
            "max_allowed_downtime": F.lit(30.0),
            "dt_stabilization": F.lit(45.0),
        }
    )
    for strategy in ("window", "bucketed"):
        out = {
            r["iot_id"]: r
            for r in apply_stabilization(df, strategy=strategy).collect()
        }
        assert set(out) == {1, 2, 3, 4}, strategy
        nul = out[2]
        assert nul["within_limits"] is False
        for c in ("dt", "cumsum", "time_down", "time_up_since",
                  "block_id", "max_downtime", "stabilization_flag"):
            assert nul[c] is None, (strategy, c)
        # real rows: blocks 1 (up), 2 (down), 3 (up) — null row invisible
        assert [out[k]["block_id"] for k in (1, 3, 4)] == [1, 2, 3], strategy


def test_spatial_outlier_span_bucketed_matches_window(spark):
    """threshold_mode='span' under strategy='bucketed' computes the
    window span via the bucketed min/max twin — flags must match the
    plain-window strategy row-for-row (the span used to run a plain,
    possibly empty-partition window even when bucketed was selected)."""
    from qualityassurancetool_spark.operators.spatial_outlier import (
        apply_spatial_outlier_check,
    )

    obs = events_as_observations(spark, SF_DIR)
    kw = dict(
        max_dx_dt=0.5,
        time_window="10min",
        partition_cols=["observation_type"],
        threshold_mode="span",
    )
    ref = apply_spatial_outlier_check(obs, strategy="window", **kw)
    got = apply_spatial_outlier_check(obs, strategy="bucketed", **kw)
    assert "_span_min" not in got.columns
    _assert_equal_maps(
        _collect_map(ref, "iot_id", "qc_flag"),
        _collect_map(got, "iot_id", "qc_flag"),
    )
    # both strategies actually flag something at this budget (the
    # parity isn't vacuous)
    assert ref.where("qc_flag = 4").count() > 0


def test_zscore_bucketed_reference_frame_matches_window(spark):
    """The bucketed twin's frame='reference' (strict-past lagged
    population-σ — the golden-replay convention) must agree row-for-row
    with the plain twin, including the lag across bucket boundaries
    and the σ=0 → ±inf movement rule."""
    obs = events_as_observations(spark, SF_DIR)
    ref = calc_zscore(
        obs, group_col="observation_type", rolling_time_window="60min",
        frame="reference",
    )
    got = calc_zscore_bucketed(
        obs,
        group_col="observation_type",
        rolling_time_window="60min",
        bucket="120min",  # many buckets: heavy halo + boundary-lag use
        frame="reference",
    )
    _assert_equal_maps(
        _collect_map(ref, "iot_id", "zscore"),
        _collect_map(got, "iot_id", "zscore"),
    )


def test_zscore_bucketed_reference_validation(spark):
    obs = events_as_observations(spark, SF_DIR)
    with pytest.raises(ValueError, match="window strategy"):
        calc_zscore_bucketed(obs, frame="reference", strategy="pandas")
    with pytest.raises(ValueError, match="unknown frame"):
        calc_zscore_bucketed(obs, frame="leading")


def test_fractional_second_window_bound_parity(spark):
    """Fractional-second windows must resolve to the SAME integer-µs
    bound in the plain and bucketed twins.  2.675 s is 2674999.999… µs
    as a double: a plain path that truncates while the bucketed one
    rounds puts two rows exactly 2675000 µs apart inside one twin's
    window and outside the other's (review finding, round 8) — both now
    go through timedelta_micros."""
    df = spark.createDataFrame(
        [
            (1, "1970-01-01T00:00:00.000000", 10.0),
            (1, "1970-01-01T00:00:02.675000", 14.0),  # exactly Δ later
        ],
        "datastream_id int, phenomenon_time string, result double",
    ).withColumn(
        "phenomenon_time", F.to_timestamp("phenomenon_time")
    )
    kw = dict(rolling_time_window="2675ms")
    plain = _collect_map(
        calc_zscore(df, **kw), "phenomenon_time", "zscore"
    )
    bucketed = _collect_map(
        calc_zscore_bucketed(df, **kw), "phenomenon_time", "zscore"
    )
    _assert_equal_maps(plain, bucketed)
    # the boundary row's window must CONTAIN the first row (round, not
    # truncate): two distinct values → sample σ > 0 → a real z-score
    late = [v for k, v in plain.items() if k.second == 2]
    assert late and late[0] is not None


def test_odd_micro_window_median_half_parity(spark):
    """Centered-median twins must halve an odd-µs window identically
    (plain: timedelta_micros(w) // 2; bucketed recovers the same
    integer instead of re-rounding float seconds)."""
    df = spark.createDataFrame(
        [
            (1, "1970-01-01T00:00:00.000000", 1.0, 1.0),
            (1, "1970-01-01T00:00:00.001000", 2.0, 2.0),
            (1, "1970-01-01T00:00:00.002000", 4.0, 4.0),
        ],
        "datastream_id int, phenomenon_time string, lat double, long double",
    ).withColumn(
        "phenomenon_time", F.to_timestamp("phenomenon_time")
    )
    for w in ("2.000001s", "3ms"):
        plain = _collect_map(
            with_median_track(
                df, time_window=w, partition_cols=["datastream_id"]
            ),
            "phenomenon_time",
            "median_lat",
        )
        bucketed = _collect_map(
            median_track_bucketed(
                df, time_window=w, partition_cols=["datastream_id"]
            ),
            "phenomenon_time",
            "median_lat",
        )
        _assert_equal_maps(plain, bucketed)

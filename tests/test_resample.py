"""Gap-fill resampling (operators/resample): hand-computed linear
interpolation, exact-hit passthrough, edge (no-extrapolation)
semantics, ffill/nearest methods, duplicate-timestamp discipline,
grid alignment."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.resample import (
    resample_interpolate,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _obs(spark, rows):
    """rows = [(stream, offset_seconds, value)]"""
    return spark.createDataFrame(
        [
            (s, T0 + dt.timedelta(seconds=off), float(v))
            for s, off, v in rows
        ],
        ["datastream_id", "phenomenon_time", "result"],
    )


def _collect(df):
    return {
        (r.datastream_id, r.grid_ts): (r.value, r.n_src)
        for r in df.collect()
    }


def test_linear_hand_computed(spark):
    # obs at 0s (v=10) and 90s (v=40): ticks 0/30/60/90
    df = _obs(spark, [("a", 0, 10), ("a", 90, 40)])
    got = _collect(resample_interpolate(df, freq_seconds=30))
    t = lambda s: T0 + dt.timedelta(seconds=s)
    assert got[("a", t(0))] == (10.0, 1)
    assert got[("a", t(30))][0] == pytest.approx(20.0)
    assert got[("a", t(60))][0] == pytest.approx(30.0)
    assert got[("a", t(90))] == (40.0, 1)
    assert got[("a", t(30))][1] == 0  # filled tick


def test_no_extrapolation_and_off_grid_sources(spark):
    # obs at 10s and 50s: grid ticks 30s only falls inside [10, 50];
    # ticks AT 0/60 don't exist (grid spans ceil(10/30)*30=30 .. 50)
    df = _obs(spark, [("a", 10, 0), ("a", 50, 100)])
    got = _collect(resample_interpolate(df, freq_seconds=30))
    assert set(got) == {("a", T0 + dt.timedelta(seconds=30))}
    assert got[("a", T0 + dt.timedelta(seconds=30))][0] == pytest.approx(
        50.0
    )


def test_ffill_and_nearest(spark):
    df = _obs(spark, [("a", 0, 10), ("a", 100, 50)])
    ff = _collect(
        resample_interpolate(df, freq_seconds=40, method="ffill")
    )
    t = lambda s: T0 + dt.timedelta(seconds=s)
    assert ff[("a", t(40))][0] == 10.0
    assert ff[("a", t(80))][0] == 10.0
    nr = _collect(
        resample_interpolate(df, freq_seconds=40, method="nearest")
    )
    assert nr[("a", t(40))][0] == 10.0  # 40 vs 60 away
    assert nr[("a", t(80))][0] == 50.0  # 80 vs 20 away
    # tie at 50 with freq 50: 50-0 == 100-50 -> earlier wins
    tie = _collect(
        resample_interpolate(df, freq_seconds=50, method="nearest")
    )
    assert tie[("a", t(50))][0] == 10.0


def test_duplicate_timestamps_largest_wins(spark):
    df = _obs(spark, [("a", 0, 3), ("a", 0, 7), ("a", 60, 10)])
    got = _collect(resample_interpolate(df, freq_seconds=60))
    t0 = T0
    assert got[("a", t0)][0] == 7.0  # largest duplicate
    assert got[("a", t0)][1] == 2  # and the duplication is visible


def test_multi_stream_independent_grids(spark):
    df = _obs(spark, [("a", 0, 1), ("a", 60, 2), ("b", 120, 9)])
    got = _collect(resample_interpolate(df, freq_seconds=60))
    streams = {k[0] for k in got}
    assert streams == {"a", "b"}
    # b has a single point: its grid is just that tick
    assert got[("b", T0 + dt.timedelta(seconds=120))] == (9.0, 1)


def test_epoch_aligned_grids_line_up(spark):
    # streams starting at different offsets share tick epochs
    df = _obs(spark, [("a", 7, 1), ("a", 130, 2), ("b", 64, 5), ("b", 190, 6)])
    out = resample_interpolate(df, freq_seconds=60)
    epochs = {
        r.grid_ts.second + 60 * r.grid_ts.minute for r in out.collect()
    }
    assert all(e % 60 == 0 for e in epochs)


def test_validation(spark):
    df = _obs(spark, [("a", 0, 1)])
    with pytest.raises(ValueError):
        resample_interpolate(df, method="cubic")
    with pytest.raises(ValueError):
        resample_interpolate(df, freq_seconds=0)


def test_no_tick_in_span_yields_empty_not_error(spark):
    """A stream whose observed span contains no grid tick (single
    off-grid point, or all points inside one inter-tick gap) must
    produce ZERO grid rows — not an IllegalArgumentException from
    sequence(start > stop)."""
    # single off-grid observation
    df = _obs(spark, [("a", 13, 5)])
    assert resample_interpolate(df, freq_seconds=60).count() == 0
    # two observations inside one inter-tick gap
    df = _obs(spark, [("a", 13, 5), ("a", 47, 7)])
    assert resample_interpolate(df, freq_seconds=60).count() == 0


def test_no_tick_stream_does_not_abort_others(spark):
    df = _obs(
        spark, [("gapless", 13, 5), ("ok", 0, 1), ("ok", 60, 2)]
    )
    got = _collect(resample_interpolate(df, freq_seconds=60))
    assert {k[0] for k in got} == {"ok"}
    assert got[("ok", T0)] == (1.0, 1)


def test_duplicate_neighbor_picks_prev_max_next_min(spark):
    # duplicate-timestamp discipline when the duplicated epoch serves
    # as a NEIGHBOR of a filled tick: the forward window's order
    # (_v asc, last non-null wins) picks the LARGEST duplicate as the
    # previous observation, the reversed window (_v desc) the SMALLEST
    # as the next — pinned here because the single-scan rewrite
    # reproduces it with max()/min() pre-aggregation (round-11).
    df = _obs(
        spark,
        [("a", 0, 3), ("a", 0, 7), ("a", 120, 20), ("a", 120, 30)],
    )
    got = _collect(resample_interpolate(df, freq_seconds=60))
    mid = T0 + dt.timedelta(seconds=60)
    # prev neighbor = max(3, 7) = 7; next neighbor = min(20, 30) = 20
    assert got[("a", mid)] == (pytest.approx(7 + (20 - 7) * 0.5), 0)
    # exact-hit ticks keep the largest-duplicate value and the count
    assert got[("a", T0)] == (7.0, 2)
    assert got[("a", T0 + dt.timedelta(seconds=120))] == (30.0, 2)


def test_duplicate_all_null_epoch_skipped_as_neighbor(spark):
    # an epoch whose duplicates are ALL null-valued still anchors _pt
    # (exact-hit detection) but contributes no value: the previous
    # non-null value comes from an earlier epoch
    rows = [
        ("a", T0, 5.0),
        ("a", T0 + dt.timedelta(seconds=60), None),
        ("a", T0 + dt.timedelta(seconds=120), 9.0),
    ]
    df = spark.createDataFrame(
        rows, ["datastream_id", "phenomenon_time", "result"]
    )
    got = _collect(resample_interpolate(df, freq_seconds=60))
    # tick at 60 s is an exact hit on the null observation: interp
    # returns the last non-null PREVIOUS value (5.0), not null-blend
    assert got[("a", T0 + dt.timedelta(seconds=60))] == (5.0, 1)

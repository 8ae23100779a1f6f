"""Alert episodes (operators/episodes): hand-built islands, gap
splitting, debounce renumbering, null flag/ts discipline, peak."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.episodes import flag_episodes

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    """rows = [(group, minutes_offset|None, flagged|None, value)]"""
    return spark.createDataFrame(
        [
            (
                g,
                None if m is None else T0 + dt.timedelta(minutes=m),
                f,
                float(v),
            )
            for g, m, f, v in rows
        ],
        "g string, ts timestamp, fl boolean, x double",
    )


def test_hand_built_islands(spark):
    rows = (
        # episode 1: 0-20 min (3 rows, peak 9)
        [("s", 0, True, 5), ("s", 10, True, 9), ("s", 20, True, 7)]
        # quiet gap > 1h
        + [("s", 45, False, 1), ("s", 70, False, 1)]
        # episode 2: single row at 100
        + [("s", 100, True, 3)]
    )
    out = {
        r["episode"]: r
        for r in flag_episodes(
            _df(spark, rows), "fl", "ts", ["g"],
            max_gap="1h", value_col="x",
        ).collect()
    }
    assert set(out) == {1, 2}
    e1 = out[1]
    assert e1["start"] == T0 and e1["end"] == T0 + dt.timedelta(minutes=20)
    assert e1["n_rows"] == 3 and e1["duration_s"] == 1200.0
    assert e1["peak_value"] == 9.0
    assert out[2]["n_rows"] == 1 and out[2]["duration_s"] == 0.0


def test_gap_splits_and_debounce(spark):
    rows = [("s", m, True, 1) for m in (0, 10, 200, 210, 220, 500)]
    out = flag_episodes(
        _df(spark, rows), "fl", "ts", ["g"], max_gap="30min"
    )
    assert out.count() == 3
    deb = {
        r["episode"]: r["n_rows"]
        for r in flag_episodes(
            _df(spark, rows), "fl", "ts", ["g"],
            max_gap="30min", min_rows=2,
        ).collect()
    }
    # blip at 500 dropped; ids renumbered densely
    assert deb == {1: 2, 2: 3}


def test_null_flag_and_null_ts_ignored(spark):
    rows = [
        ("s", 0, True, 1),
        ("s", 5, None, 1),   # unknown != alert
        ("s", 10, True, 1),
        ("s", None, True, 1),  # no timestamp, no episode
    ]
    out = flag_episodes(_df(spark, rows), "fl", "ts", ["g"]).collect()
    assert len(out) == 1 and out[0]["n_rows"] == 2


def test_groups_independent_and_expression_flag(spark):
    rows = [("a", 0, True, 9), ("b", 0, True, 1), ("b", 5, True, 2)]
    out = flag_episodes(
        _df(spark, rows), F.col("x") > 1.5, "ts", ["g"]
    ).collect()
    got = {(r["g"], r["episode"]): r["n_rows"] for r in out}
    assert got == {("a", 1): 1, ("b", 1): 1}


def test_validation(spark):
    df = _df(spark, [("s", 0, True, 1)])
    with pytest.raises(ValueError):
        flag_episodes(df, "fl", "ts", max_gap=0)
    with pytest.raises(ValueError):
        flag_episodes(df, "fl", "ts", min_rows=0)


def test_nan_values_ignored_for_peak(spark):
    """A NaN reading inside an episode must not poison the peak: Spark's
    plain max orders NaN above every double, but the episode peak is
    defined as the largest REAL value (matching the streaming twin's
    running max, streaming/episodes.py)."""
    rows = [("s", 0, True, 5), ("s", 10, True, float("nan")),
            ("s", 20, True, 7)]
    out = flag_episodes(
        _df(spark, rows), "fl", "ts", ["g"], max_gap="1h", value_col="x"
    ).collect()
    assert len(out) == 1
    assert out[0]["peak_value"] == 7.0

    # an episode that saw ONLY NaN values has no real peak -> NULL
    only_nan = [("s", 0, True, float("nan"))]
    out2 = flag_episodes(
        _df(spark, only_nan), "fl", "ts", ["g"], max_gap="1h",
        value_col="x",
    ).collect()
    assert out2[0]["peak_value"] is None

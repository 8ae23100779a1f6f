"""funnel_depth / funnel_report — first-touch ordered funnel."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.funnel import (
    funnel_depth,
    funnel_report,
)

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (u, T0 + dt.timedelta(seconds=s), t)
            for (u, s, t) in rows
        ],
        schema="user_id long, ts timestamp, event_type string",
    )


STEPS = ["view", "click", "purchase"]


def _depths(df):
    return {
        r["user_id"]: r["depth"] for r in df.collect()
    }


def test_basic_chain_and_partial(spark):
    ev = _ev(
        spark,
        [
            # u1 completes all three in order
            (1, 0, "view"),
            (1, 10, "click"),
            (1, 20, "purchase"),
            # u2 stops after click
            (2, 0, "view"),
            (2, 5, "click"),
            # u3 purchase BEFORE view: depth 1 only
            (3, 0, "purchase"),
            (3, 10, "view"),
            # u4 never views -> excluded entirely
            (4, 0, "click"),
            (4, 1, "purchase"),
        ],
    )
    d = _depths(funnel_depth(ev, STEPS))
    assert d == {1: 3, 2: 2, 3: 1}


def test_first_touch_anchor_is_earliest_step1(spark):
    # u1's first view is at t=0; the click at t=5 comes after it even
    # though a LATER view (t=10) also exists -> depth 2 anchored at 0
    ev = _ev(
        spark,
        [(1, 0, "view"), (1, 5, "click"), (1, 10, "view")],
    )
    rows = funnel_depth(ev, STEPS).collect()
    assert rows[0]["depth"] == 2
    assert rows[0]["anchor_us"] == int(T0.timestamp() * 1e6)


def test_strictly_increasing_equal_ts_never_double_advances(spark):
    # click at the SAME instant as the view cannot count
    ev = _ev(
        spark,
        [(1, 0, "view"), (1, 0, "click")],
    )
    assert _depths(funnel_depth(ev, STEPS)) == {1: 1}
    # ... but a later click still advances
    ev2 = _ev(
        spark,
        [(1, 0, "view"), (1, 0, "click"), (1, 3, "click")],
    )
    assert _depths(funnel_depth(ev2, STEPS)) == {1: 2}


def test_conversion_window(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"),
            (1, 30, "click"),
            (1, 3000, "purchase"),  # inside 1h of the anchor
            (2, 0, "view"),
            (2, 3700, "click"),  # outside 1h window
        ],
    )
    d = _depths(funnel_depth(ev, STEPS, within="1h"))
    assert d == {1: 3, 2: 1}
    # tighter window cuts u1's purchase (3000s > 30min) but keeps
    # the click; first-touch anchoring never re-anchors at a later
    # view to rescue it
    d2 = _depths(funnel_depth(ev, STEPS, within="30min"))
    assert d2 == {1: 2, 2: 1}


def test_out_of_order_and_repeats_use_earliest_valid(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"),
            (1, 1, "purchase"),  # too early (click not yet matched)
            (1, 2, "click"),
            (1, 3, "purchase"),
        ],
    )
    rows = funnel_depth(ev, STEPS).collect()
    assert rows[0]["depth"] == 3
    assert rows[0]["last_us"] == int(
        (T0 + dt.timedelta(seconds=3)).timestamp() * 1e6
    )


def test_report_counts_and_pct(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"),
            (1, 1, "click"),
            (1, 2, "purchase"),
            (2, 0, "view"),
            (2, 1, "click"),
            (3, 0, "view"),
            (4, 0, "view"),
        ],
    )
    rep = funnel_report(
        funnel_depth(ev, STEPS), STEPS
    ).orderBy("step")
    got = [
        (r["step"], r["step_name"], r["users"], r["pct_of_first"])
        for r in rep.collect()
    ]
    assert got == [
        (1, "view", 4, 100.0),
        (2, "click", 2, 50.0),
        (3, "purchase", 1, 25.0),
    ]


def test_report_includes_unreached_steps(spark):
    ev = _ev(spark, [(1, 0, "view")])
    rep = funnel_report(funnel_depth(ev, STEPS), STEPS)
    got = {r["step"]: r["users"] for r in rep.collect()}
    assert got == {1: 1, 2: 0, 3: 0}


def test_validation(spark):
    ev = _ev(spark, [(1, 0, "view")])
    with pytest.raises(ValueError):
        funnel_depth(ev, [])
    with pytest.raises(ValueError):
        funnel_depth(ev, ["view", "view"])


def test_null_timestamps_ignored(spark):
    ev = _ev(spark, [(1, 0, "view"), (1, 5, "click")]).union(
        _ev(spark, [(1, 0, "purchase")]).withColumn(
            "ts", F.lit(None).cast("timestamp")
        )
    )
    assert _depths(funnel_depth(ev, STEPS)) == {1: 2}

"""cooccurrence (bipartite projection) + event_transitions."""

import datetime as dt

import pytest

from qualityassurancetool_spark.operators.cooccurrence import cooccurrence
from qualityassurancetool_spark.operators.transitions import (
    event_transitions,
)


def _ui(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(i)) for u, i in pairs],
        schema="user_id long, item_id long",
    )


def _pairs(df):
    return {
        (r["item_a"], r["item_b"]): r["n_users"] for r in df.collect()
    }


def test_basic_projection(spark):
    ui = _ui(
        spark,
        [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (3, 20)],
    )
    got = _pairs(cooccurrence(ui))
    assert got == {(10, 20): 2, (10, 30): 1, (20, 30): 1}


def test_duplicates_collapse_and_canonical_order(spark):
    ui = _ui(spark, [(1, 20), (1, 10), (1, 20), (1, 10)])
    got = _pairs(cooccurrence(ui))
    assert got == {(10, 20): 1}


def test_max_per_user_keeps_smallest_items(spark):
    # user 1 touches 5 items; cap 3 keeps {10,20,30} only
    ui = _ui(spark, [(1, i) for i in (50, 40, 30, 20, 10)])
    got = _pairs(cooccurrence(ui, max_per_user=3))
    assert got == {(10, 20): 1, (10, 30): 1, (20, 30): 1}


def test_min_count_floor(spark):
    ui = _ui(
        spark,
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30)],
    )
    got = _pairs(cooccurrence(ui, min_count=2))
    assert got == {(10, 20): 2}


def test_single_item_users_contribute_nothing(spark):
    ui = _ui(spark, [(1, 10), (2, 20), (3, 30)])
    assert _pairs(cooccurrence(ui)) == {}


def test_capped_and_uncapped_paths_agree(spark):
    # the two physical regimes (HOF comprehension vs streaming
    # self-join) must be row-identical when the cap exceeds every
    # basket size
    ui = _ui(
        spark,
        [(u, (u * 7 + j * 13) % 40) for u in range(30) for j in range(6)],
    )
    capped = _pairs(cooccurrence(ui, max_per_user=100, min_count=2))
    uncapped = _pairs(cooccurrence(ui, min_count=2))
    assert capped == uncapped and len(capped) > 0


def test_cap_validation(spark):
    ui = _ui(spark, [(1, 10)])
    with pytest.raises(ValueError):
        cooccurrence(ui, max_per_user=1)


T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (u, T0 + dt.timedelta(seconds=s), t, k)
            for k, (u, s, t) in enumerate(rows)
        ],
        schema=(
            "user_id long, ts timestamp, event_type string,"
            " event_id long"
        ),
    )


def test_transitions_counts_and_probs(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"),
            (1, 1, "click"),
            (1, 2, "view"),
            (1, 3, "click"),
            (2, 0, "view"),
            (2, 1, "purchase"),
        ],
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(
            ev, order_extra=["event_id"]
        ).collect()
    }
    assert got[("view", "click")] == (2, round(2 / 3, 6))
    assert got[("view", "purchase")] == (1, round(1 / 3, 6))
    assert got[("click", "view")] == (1, 1.0)
    assert len(got) == 3


def test_transitions_never_cross_users(spark):
    ev = _ev(spark, [(1, 0, "view"), (2, 1, "click")])
    assert event_transitions(ev).count() == 0


def test_transitions_tie_break_deterministic(spark):
    # two events at the same instant: event_id orders them
    ev = _ev(
        spark,
        [(1, 0, "view"), (1, 0, "click"), (1, 5, "purchase")],
    )
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in event_transitions(
            ev, order_extra=["event_id"]
        ).collect()
    }
    assert got == {("view", "click"): 1, ("click", "purchase"): 1}

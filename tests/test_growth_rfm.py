"""growth_accounting + rfm_segments."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.growth import growth_accounting
from qualityassurancetool_spark.operators.rfm import rfm_segments


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime.fromisoformat(ts)) for u, ts in rows],
        schema="user_id long, ts timestamp",
    )


def _rows(df):
    return {
        str(r["period_start"]): (
            r["new_users"],
            r["retained"],
            r["resurrected"],
            r["churned"],
        )
        for r in df.collect()
    }


def test_new_retained_resurrected_churned(spark):
    # weeks: W0=2024-01-01, W1=01-08, W2=01-15, W3=01-22
    ev = _ev(
        spark,
        [
            (1, "2024-01-01T10:00"),  # u1: W0, W1, W3 (resurrects)
            (1, "2024-01-08T10:00"),
            (1, "2024-01-22T10:00"),
            (2, "2024-01-01T11:00"),  # u2: W0 only (churns into W1)
            (3, "2024-01-08T09:00"),  # u3: W1, W2
            (3, "2024-01-15T09:00"),
        ],
    )
    g = _rows(growth_accounting(ev, period="week"))
    assert g["2024-01-01"] == (2, 0, 0, 0)
    assert g["2024-01-08"] == (1, 1, 0, 1)  # u3 new, u1 ret, u2 churn
    assert g["2024-01-15"] == (0, 1, 0, 1)  # u3 ret, u1 churns out
    assert g["2024-01-22"] == (0, 0, 1, 1)  # u1 back, u3 churns
    assert g["2024-01-29"] == (0, 0, 0, 1)  # u1's trailing churn


def test_net_delta_identity(spark):
    # net actives delta == new + resurrected - churned, every period
    ev = _ev(
        spark,
        [
            (u, f"2024-01-{d:02d}T00:00")
            for u in range(20)
            for d in range(1, 29)
            if (u * 31 + d * 7) % 5 != 0
        ],
    )
    g = growth_accounting(ev, period="week").orderBy("period_start")
    rows = g.collect()
    actives = {}
    for r in (
        _ev(
            spark,
            [
                (u, f"2024-01-{d:02d}T00:00")
                for u in range(20)
                for d in range(1, 29)
                if (u * 31 + d * 7) % 5 != 0
            ],
        )
        .select(
            F.date_trunc("week", "ts").cast("date").alias("p"), "user_id"
        )
        .distinct()
        .groupBy("p")
        .count()
        .collect()
    ):
        actives[str(r["p"])] = r["count"]
    prev = 0
    for r in rows:
        cur = actives.get(str(r["period_start"]), 0)
        assert (
            cur - prev
            == r["new_users"] + r["resurrected"] - r["churned"]
        ), str(r)
        prev = cur


def test_growth_validation(spark):
    ev = _ev(spark, [(1, "2024-01-01T00:00")])
    with pytest.raises(ValueError):
        growth_accounting(ev, period="month")


def _orders(spark, rows):
    return spark.createDataFrame(
        [
            (c, dt.date.fromisoformat(d), float(a))
            for c, d, a in rows
        ],
        schema="o_custkey long, o_orderdate date, o_totalprice double",
    )


def test_rfm_scores(spark):
    orders = _orders(
        spark,
        [
            # cust 1: recent, frequent, big spender
            (1, "2024-03-01", 500.0),
            (1, "2024-03-10", 500.0),
            (1, "2024-03-20", 500.0),
            # cust 2: middling
            (2, "2024-02-01", 300.0),
            (2, "2024-02-15", 100.0),
            # cust 3: stale, one small order
            (3, "2024-01-01", 50.0),
        ],
    )
    got = {
        r["customer"]: r
        for r in rfm_segments(orders, n_bins=3).collect()
    }
    assert got[1]["recency_days"] == 0
    assert got[1]["rfm_cell"] == "333"
    assert got[3]["rfm_cell"] == "111"
    assert got[2]["r"] == 2 and got[2]["f"] == 2 and got[2]["m"] == 2
    assert got[2]["monetary"] == 400.0


def test_rfm_as_of_and_validation(spark):
    orders = _orders(spark, [(1, "2024-01-01", 10.0)])
    row = rfm_segments(orders, as_of="2024-01-31").collect()[0]
    assert row["recency_days"] == 30
    with pytest.raises(ValueError):
        rfm_segments(orders, n_bins=1)


def test_rfm_approx_close_to_exact(spark):
    # near-unique monetary values per customer: on a tie-free metric
    # the cut-point binning must sit within one bin of exact ntile
    # (on heavily TIED metrics the two are legitimately different —
    # ntile splits ties across bins by rank, cut-points bin by value)
    orders = _orders(
        spark,
        [
            (c, f"2024-{1 + c % 3:02d}-{1 + (c * 7) % 28:02d}",
             10.0 * c + (c % 7))
            for c in range(200)
        ],
    )
    exact = {
        r["customer"]: r["m"]
        for r in rfm_segments(orders, n_bins=4).collect()
    }
    rows = rfm_segments(orders, n_bins=4, approx=True).collect()
    approx = {r["customer"]: r["m"] for r in rows}
    assert all(abs(exact[c] - approx[c]) <= 1 for c in exact)
    assert (
        sum(1 for c in exact if exact[c] == approx[c])
        >= len(exact) * 0.7
    )
    # value-monotonicity of approx bins on every dimension
    for metric, bin_col, flip in (
        ("recency_days", "r", -1),
        ("frequency", "f", 1),
        ("monetary", "m", 1),
    ):
        seq = sorted(
            ((r[metric], r[bin_col]) for r in rows),
            key=lambda t: flip * t[0],
        )
        bins = [b for _, b in seq]
        assert bins == sorted(bins), metric

"""EWMA smoothing / control chart: hand-computed weights,
brute-force parity, null/history discipline, spike flagging."""

import math

import pytest

from qualityassurancetool_spark.operators.ewma import (
    ewma_anomaly,
    ewma_smooth,
)


def _df(spark, values, group="s"):
    rows = [
        (group, i, None if v is None else float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "g string, t long, x double"
    )


def _brute_ewma(values, i, alpha, window):
    num = den = 0.0
    for k in range(min(window, i + 1)):
        v = values[i - k]
        if v is None:
            continue
        wk = alpha * (1.0 - alpha) ** k
        num += wk * v
        den += wk
    return num / den if den > 0 else None


def test_hand_computed_two_points(spark):
    # row1: (α·x1 + α(1−α)·x0) / (α + α(1−α))
    out = (
        ewma_smooth(
            _df(spark, [10.0, 20.0]), "x", ["t"], ["g"], alpha=0.5
        )
        .orderBy("t")
        .collect()
    )
    assert out[0]["ewma"] == pytest.approx(10.0)
    assert out[1]["ewma"] == pytest.approx(
        (0.5 * 20 + 0.25 * 10) / 0.75
    )


def test_brute_force_parity(spark):
    import random

    rng = random.Random(13)
    values = [
        None if rng.random() < 0.15 else round(rng.gauss(50, 10), 3)
        for _ in range(60)
    ]
    alpha, window = 0.3, 8
    out = (
        ewma_smooth(
            _df(spark, values), "x", ["t"], ["g"],
            alpha=alpha, window=window,
        )
        .orderBy("t")
        .collect()
    )
    for i, r in enumerate(out):
        ref = _brute_ewma(values, i, alpha, window)
        if ref is None:
            assert r["ewma"] is None
        else:
            assert r["ewma"] == pytest.approx(ref), i


def test_constant_series_is_identity(spark):
    out = ewma_smooth(
        _df(spark, [7.0] * 20), "x", ["t"], ["g"], alpha=0.2
    ).collect()
    for r in out:
        assert r["ewma"] == pytest.approx(7.0)


def test_groups_independent(spark):
    a = _df(spark, [1.0, 1.0], group="a")
    b = _df(spark, [100.0, 100.0], group="b")
    out = {
        (r["g"], r["t"]): r["ewma"]
        for r in ewma_smooth(
            a.unionByName(b), "x", ["t"], ["g"], alpha=0.5
        ).collect()
    }
    assert out[("a", 1)] == pytest.approx(1.0)
    assert out[("b", 1)] == pytest.approx(100.0)


def test_anomaly_flags_spike_but_not_stable(spark):
    values = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 25.0, 10.05]
    out = (
        ewma_anomaly(
            _df(spark, values), "x", ["t"], ["g"],
            alpha=0.4, window=6, nsigma=3.0, min_history=4,
        )
        .orderBy("t")
        .collect()
    )
    assert out[6]["ewma_flag"] is True  # the spike
    assert out[5]["ewma_flag"] is False
    # early rows lack history -> NULL, not False
    assert out[0]["ewma_flag"] is None
    assert out[1]["ewma_flag"] is None
    # deviation sign is value - history
    assert out[6]["ewma_dev"] > 0


def test_anomaly_self_excluding(spark):
    # the spike must not inflate its own baseline: ewma_prev at the
    # spike row uses only preceding values
    values = [10.0] * 6 + [100.0]
    out = (
        ewma_anomaly(
            _df(spark, values), "x", ["t"], ["g"], window=5
        )
        .orderBy("t")
        .collect()
    )
    assert out[6]["ewma_prev"] == pytest.approx(10.0)
    # sigma of constant history is 0 -> |dev| > 0 = flag True
    assert out[6]["ewma_flag"] is True


def test_null_value_null_flag(spark):
    values = [10.0, 10.0, 10.0, 10.0, 10.0, None, 10.0]
    out = (
        ewma_anomaly(
            _df(spark, values), "x", ["t"], ["g"], min_history=4
        )
        .orderBy("t")
        .collect()
    )
    assert out[5]["ewma_flag"] is None
    assert out[6]["ewma_flag"] is False


def test_validation(spark):
    df = _df(spark, [1.0])
    with pytest.raises(ValueError):
        ewma_smooth(df, "x", ["t"], alpha=0.0)
    with pytest.raises(ValueError):
        ewma_smooth(df, "x", ["t"], window=0)
    with pytest.raises(ValueError):
        ewma_smooth(df, "x", [])
    with pytest.raises(ValueError):
        ewma_anomaly(df, "x", ["t"], nsigma=0)
    with pytest.raises(ValueError):
        ewma_anomaly(df, "x", ["t"], min_history=1)


def test_truncation_error_bounded(spark):
    """window=16 at alpha=0.3 carries >99.5% of the weight mass —
    the smoothed value matches the infinite-horizon recurrence to
    the documented bound on a long stable-ish series."""
    import random

    rng = random.Random(99)
    values = [50 + rng.gauss(0, 5) for _ in range(200)]
    alpha = 0.3
    out = (
        ewma_smooth(
            _df(spark, values), "x", ["t"], ["g"],
            alpha=alpha, window=16,
        )
        .orderBy("t")
        .collect()
    )
    s = values[0]
    for v in values[1:]:
        s = alpha * v + (1 - alpha) * s
    # tail mass (1-alpha)^16 ~ 0.33% of a ~50-magnitude signal
    assert abs(out[-1]["ewma"] - s) < 0.5
    assert math.isclose(
        out[-1]["ewma"], s, rel_tol=5e-3
    )


def _ts_df(spark, values, group="s", null_ts_at=()):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (
            group,
            None
            if i in null_ts_at
            else t0 + dt.timedelta(hours=3 * i),
            i,
            None if v is None else float(v),
        )
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "g string, ts timestamp, t long, x double"
    )


def test_bucketed_parity_exact(spark):
    """The streams×buckets twin is EXACT (same lag values, same order,
    same arithmetic): row-for-row equality with the plain path across
    bucket boundaries, NULL holes, multiple streams, and buckets
    shorter than the lag window (halo spans several buckets)."""
    import random

    from qualityassurancetool_spark.operators.ewma import (
        ewma_anomaly_bucketed,
    )

    rng = random.Random(61)
    frames = []
    for grp in ("a", "b"):
        vals = [
            None if rng.random() < 0.12 else round(rng.gauss(30, 6), 3)
            for _ in range(70)
        ]
        frames.append(_ts_df(spark, vals, group=grp))
    df = frames[0].unionByName(frames[1])
    kw = dict(alpha=0.3, window=12, nsigma=2.5, min_history=4)
    plain = ewma_anomaly(df, "x", ["ts", "t"], ["g"], **kw)
    # 3h cadence, 12h buckets -> 4 rows/bucket << window=12: the halo
    # must reach back through MULTIPLE buckets
    buck = ewma_anomaly_bucketed(
        df, "x", "ts", ["g"], bucket="12h", order_extra=["t"], **kw
    )
    p = {(r["g"], r["t"]): r for r in plain.collect()}
    b = {(r["g"], r["t"]): r for r in buck.collect()}
    assert set(p) == set(b)
    for k, rp in p.items():
        rb = b[k]
        for c in ("ewma_prev", "ewma_sigma", "ewma_dev"):
            if rp[c] is None:
                assert rb[c] is None, (k, c)
            else:
                assert rb[c] == pytest.approx(rp[c], abs=1e-12), (k, c)
        assert rb["ewma_flag"] == rp["ewma_flag"], k


def test_bucketed_null_ts_rows(spark):
    """NULL-ts rows: NULL chart, no lag slot — both paths agree."""
    from qualityassurancetool_spark.operators.ewma import (
        ewma_anomaly_bucketed,
    )

    df = _ts_df(
        spark, [10.0, 10.0, 99.0, 10.0, 10.0, 10.0], null_ts_at=(2,)
    )
    kw = dict(alpha=0.4, window=4, nsigma=2.0, min_history=2)
    plain = {
        r["t"]: r
        for r in ewma_anomaly(df, "x", ["ts", "t"], ["g"], **kw).collect()
    }
    buck = {
        r["t"]: r
        for r in ewma_anomaly_bucketed(
            df, "x", "ts", ["g"], bucket="6h", order_extra=["t"], **kw
        ).collect()
    }
    for t in range(6):
        assert (plain[t]["ewma_flag"] is None) == (
            buck[t]["ewma_flag"] is None
        )
        assert plain[t]["ewma_flag"] == buck[t]["ewma_flag"], t
    # the 99.0 at the null-ts row never entered anyone's lags
    assert plain[2]["ewma_prev"] is None
    assert buck[2]["ewma_prev"] is None
    assert plain[3]["ewma_flag"] is False

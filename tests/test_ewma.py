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

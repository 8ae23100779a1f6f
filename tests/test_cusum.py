"""CUSUM control chart (operators/cusum): closed-form-vs-recurrence
parity, drift detection that per-point charts miss, null/σ=0
discipline, group independence."""

import random

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.cusum import cusum_anomaly


def _df(spark, values, group="s"):
    rows = [
        (group, i, None if v is None else float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "g string, t long, x double")


def _brute(values, mu, sd, slack):
    """The literal Page recurrence (state carried through NULLs)."""
    sp = sn = 0.0
    out = []
    for v in values:
        if v is not None and sd > 0:
            z = (v - mu) / sd
            sp = max(0.0, sp + z - slack)
            sn = max(0.0, sn - z - slack)
        out.append((sp, sn))
    return out


def test_closed_form_matches_recurrence(spark):
    rng = random.Random(7)
    values = [
        None if rng.random() < 0.1 else round(rng.gauss(20, 4), 3)
        for _ in range(80)
    ]
    mu, sd, slack = 20.0, 4.0, 0.5
    got = (
        cusum_anomaly(
            _df(spark, values), "x", ["t"], ["g"],
            target=mu, sigma=sd, slack=slack, threshold=5.0,
        )
        .orderBy("t")
        .collect()
    )
    ref = _brute(values, mu, sd, slack)
    started = False
    for r, (sp, sn) in zip(got, ref):
        if r["x"] is None and not started:
            continue  # leading NULLs have no state yet (NULL stat)
        started = True
        assert r["cusum_pos"] == pytest.approx(sp, abs=1e-9), r["t"]
        assert r["cusum_neg"] == pytest.approx(sn, abs=1e-9), r["t"]


def test_detects_small_persistent_shift(spark):
    # 1σ shift after t=40: each point is individually unremarkable
    # (|z| ~ 1, never near 3) but CUSUM accumulates to the h=5 signal
    rng = random.Random(11)
    values = [rng.gauss(10, 1) for _ in range(40)] + [
        rng.gauss(11, 1) for _ in range(40)
    ]
    out = (
        cusum_anomaly(
            _df(spark, values), "x", ["t"], ["g"],
            target=10.0, sigma=1.0,
        )
        .orderBy("t")
        .collect()
    )
    pre = [r for r in out if r["t"] < 40]
    post = [r for r in out if r["t"] >= 55]
    assert not any(r["cusum_flag"] for r in pre)
    assert all(r["cusum_flag"] for r in post)
    # and no single point would trip a 3-sigma per-point chart
    assert max(abs(v - 10.0) for v in values) < 3.0 * 1.0 * 1.5


def test_in_control_stays_quiet(spark):
    # h=8: ARL0 for the default h=5 is ~230 two-sided, so 200
    # in-control points would false-signal about half the time by
    # DESIGN — the quiet test needs the wider band
    rng = random.Random(23)
    values = [rng.gauss(5, 2) for _ in range(200)]
    out = cusum_anomaly(
        _df(spark, values), "x", ["t"], ["g"],
        target=5.0, sigma=2.0, threshold=8.0,
    ).collect()
    assert not any(r["cusum_flag"] for r in out)


def test_estimated_baseline_and_null_flag(spark):
    values = [10.0, 10.2, 9.8, None, 10.1, 9.9]
    out = (
        cusum_anomaly(_df(spark, values), "x", ["t"], ["g"])
        .orderBy("t")
        .collect()
    )
    assert out[3]["cusum_flag"] is None  # NULL value -> NULL flag
    # state carried through the hole: row 4 continues from row 2
    assert out[4]["cusum_flag"] is False
    assert all(
        r["cusum_flag"] is False for i, r in enumerate(out) if i != 3
    )


def test_sigma_zero_gives_null_chart(spark):
    out = cusum_anomaly(
        _df(spark, [7.0] * 10), "x", ["t"], ["g"]
    ).collect()
    for r in out:  # constant stream: estimated sd=0 -> no chart
        assert r["cusum_flag"] is None


def test_groups_independent_and_null_group(spark):
    a = _df(spark, [10.0] * 20 + [30.0] * 5, group="a")
    b = _df(spark, [10.0] * 25, group="b")
    n = spark.createDataFrame(
        [(None, i, 10.0 + i % 2) for i in range(25)],
        "g string, t long, x double",
    )
    out = cusum_anomaly(
        a.unionByName(b).unionByName(n), "x", ["t"], ["g"],
        target=10.0, sigma=1.0,
    )
    by_g = {
        g: [r["cusum_flag"] for r in rows]
        for g, rows in (
            (k, sorted(v, key=lambda r: r["t"]))
            for k, v in (
                (g, [r for r in out.collect() if r["g"] == g])
                for g in ("a", "b", None)
            )
        )
    }
    assert any(by_g["a"])
    assert not any(by_g["b"])
    assert by_g[None] and all(f is False for f in by_g[None])


def test_validation(spark):
    df = _df(spark, [1.0])
    with pytest.raises(ValueError):
        cusum_anomaly(df, "x", [])
    with pytest.raises(ValueError):
        cusum_anomaly(df, "x", ["t"], slack=-1)
    with pytest.raises(ValueError):
        cusum_anomaly(df, "x", ["t"], threshold=0)


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


def test_bucketed_parity(spark):
    """Streams×buckets twin matches the plain path row-for-row (1e-9;
    the two-phase scans re-associate the running sums), including NULL
    values, estimated baselines, multiple streams, and buckets that
    split the stream mid-chart."""
    from qualityassurancetool_spark.operators.cusum import (
        cusum_anomaly_bucketed,
    )

    rng = random.Random(41)
    frames = []
    for grp, shift in (("a", 0.0), ("b", 1.2)):
        vals = [
            None if rng.random() < 0.1 else rng.gauss(50 + shift, 5)
            for _ in range(90)
        ]
        frames.append(_ts_df(spark, vals, group=grp))
    df = frames[0].unionByName(frames[1])
    plain = cusum_anomaly(df, "x", ["ts", "t"], ["g"], slack=0.4)
    # 1d bucket over 3h cadence -> ~8 rows per bucket, many carries
    buck = cusum_anomaly_bucketed(
        df, "x", "ts", ["g"], slack=0.4, bucket="1d",
        order_extra=["t"],
    )
    p = {(r["g"], r["t"]): r for r in plain.collect()}
    b = {(r["g"], r["t"]): r for r in buck.collect()}
    assert set(p) == set(b)
    for k, rp in p.items():
        rb = b[k]
        for c in ("cusum_pos", "cusum_neg"):
            if rp[c] is None:
                assert rb[c] is None, (k, c)
            else:
                assert rb[c] == pytest.approx(rp[c], abs=1e-9), (k, c)
        assert rb["cusum_flag"] == rp["cusum_flag"], k


def test_bucketed_null_ts_rows(spark):
    """NULL-timestamp rows: NULL chart columns, zero state
    contribution — in BOTH paths (the unified null-ts discipline)."""
    from qualityassurancetool_spark.operators.cusum import (
        cusum_anomaly_bucketed,
    )

    df = _ts_df(
        spark, [10.0, 99.0, 10.2, 9.9, 10.1], null_ts_at=(1,)
    )
    for out in (
        cusum_anomaly(df, "x", ["ts", "t"], ["g"], target=10.0, sigma=1.0),
        cusum_anomaly_bucketed(
            df, "x", "ts", ["g"], target=10.0, sigma=1.0,
            order_extra=["t"],
        ),
    ):
        rows = {r["t"]: r for r in out.collect()}
        assert rows[1]["cusum_flag"] is None
        assert rows[1]["cusum_pos"] is None
        # the 99.0 at the null-ts row never fed the chart: later rows
        # of the constant-ish stream stay unflagged
        assert rows[4]["cusum_flag"] is False


def test_bucketed_null_group_stratum(spark):
    """NULL group keys are their own stratum in the bucketed twin too
    (the carry join is null-safe; an equi-join would drop the rows)."""
    from qualityassurancetool_spark.operators.cusum import (
        cusum_anomaly_bucketed,
    )

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (None, t0 + dt.timedelta(hours=3 * i), i, 10.0 + (i % 2))
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "g string, ts timestamp, t long, x double"
    )
    out = cusum_anomaly_bucketed(
        df, "x", "ts", ["g"], target=10.5, sigma=0.5,
        bucket="1d", order_extra=["t"],
    )
    got = out.collect()
    assert len(got) == 30
    assert all(r["cusum_flag"] is False for r in got)
    # and parity with the plain path on the same stratum
    plain = {
        r["t"]: r["cusum_pos"]
        for r in cusum_anomaly(
            df, "x", ["ts", "t"], ["g"], target=10.5, sigma=0.5
        ).collect()
    }
    for r in got:
        assert r["cusum_pos"] == pytest.approx(plain[r["t"]], abs=1e-9)

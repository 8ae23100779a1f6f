"""`analytics` CLI subcommand e2e: funnel / cohort / growth /
transitions / rfm / cooccurrence / ols over parquet inputs."""

from __future__ import annotations

import datetime as dt

import pytest

from qualityassurancetool_spark.cli import main
from qualityassurancetool_spark.config import ConfigError


@pytest.fixture()
def events_src(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(30):
        rows.append((u, t0 + dt.timedelta(hours=u), "view", 3 * u))
        if u % 2 == 0:
            rows.append(
                (u, t0 + dt.timedelta(hours=u, minutes=30), "click",
                 3 * u + 1)
            )
        if u % 6 == 0:
            rows.append(
                (u, t0 + dt.timedelta(hours=u + 1), "purchase",
                 3 * u + 2)
            )
        if u % 3 == 0:  # second-week activity for cohort/growth
            rows.append(
                (u, t0 + dt.timedelta(days=8, hours=u), "view",
                 3 * u + 100)
            )
    src = str(tmp_path / "events")
    spark.createDataFrame(
        rows,
        schema=(
            "user_id long, ts timestamp, event_type string,"
            " event_id long"
        ),
    ).write.parquet(src)
    return src


def _run(argv):
    rc = main(argv)
    assert rc == 0


def test_funnel_and_report(spark, events_src, tmp_path, capsys):
    out = str(tmp_path / "fun")
    _run([
        "analytics", "--keep-session", f"data.input={events_src}",
        f"data.out={out}", "method=funnel",
        "steps=[view, click, purchase]", "within=2h",
    ])
    capsys.readouterr()
    depth = {
        r["user_id"]: r["depth"]
        for r in spark.read.parquet(out).collect()
    }
    assert len(depth) == 30
    assert depth[0] == 3 and depth[2] == 2 and depth[1] == 1

    out2 = str(tmp_path / "rep")
    _run([
        "analytics", "--keep-session", f"data.input={events_src}",
        f"data.out={out2}", "method=funnel",
        "steps=[view, click, purchase]", "within=2h", "report=true",
    ])
    capsys.readouterr()
    rep = {
        r["step_name"]: r["users"]
        for r in spark.read.parquet(out2).collect()
    }
    assert rep == {"view": 30, "click": 15, "purchase": 5}


def test_cohort_and_growth(spark, events_src, tmp_path, capsys):
    out = str(tmp_path / "coh")
    _run([
        "analytics", "--keep-session", f"data.input={events_src}",
        f"data.out={out}", "method=cohort", "period=week",
    ])
    capsys.readouterr()
    cells = {
        (str(r["cohort"]), r["period_offset"]): r["active_users"]
        for r in spark.read.parquet(out).collect()
    }
    assert cells[("2024-01-01", 0)] == 30
    assert cells[("2024-01-01", 1)] == 10

    out2 = str(tmp_path / "gro")
    _run([
        "analytics", "--keep-session", f"data.input={events_src}",
        f"data.out={out2}", "method=growth", "period=week",
    ])
    capsys.readouterr()
    g = {
        str(r["period_start"]): (r["new_users"], r["churned"])
        for r in spark.read.parquet(out2).collect()
    }
    assert g["2024-01-01"] == (30, 0)
    assert g["2024-01-08"] == (0, 20)


def test_transitions_and_cooccurrence(spark, events_src, tmp_path, capsys):
    out = str(tmp_path / "tr")
    _run([
        "analytics", "--keep-session", f"data.input={events_src}",
        f"data.out={out}", "method=transitions",
        "order_extra=[event_id]",
    ])
    capsys.readouterr()
    t = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    assert t[("view", "click")] == 15

    ui = str(tmp_path / "ui")
    spark.createDataFrame(
        [(u, u % 4) for u in range(20)]
        + [(u, 99) for u in range(20)],
        schema="user_id long, item_id long",
    ).write.parquet(ui)
    out2 = str(tmp_path / "co")
    _run([
        "analytics", "--keep-session", f"data.input={ui}",
        f"data.out={out2}", "method=cooccurrence", "max_per_user=8",
        "min_count=5",
    ])
    capsys.readouterr()
    pairs = {
        (r["item_a"], r["item_b"]): r["n_users"]
        for r in spark.read.parquet(out2).collect()
    }
    assert pairs == {(i, 99): 5 for i in range(4)}


def test_rfm_and_ols(spark, tmp_path, capsys):
    orders = str(tmp_path / "orders")
    spark.createDataFrame(
        [
            (c, dt.date(2024, 1 + c % 3, 1 + c % 28),
             100.0 + 7.0 * c)
            for c in range(60)
        ],
        schema="o_custkey long, o_orderdate date, o_totalprice double",
    ).write.parquet(orders)
    out = str(tmp_path / "rfm")
    _run([
        "analytics", "--keep-session", f"data.input={orders}",
        f"data.out={out}", "method=rfm", "n_bins=4",
    ])
    capsys.readouterr()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 60
    assert all(1 <= r["r"] <= 4 for r in rows)

    pts = str(tmp_path / "pts")
    spark.createDataFrame(
        [("g", float(i), 2.0 * i + 1.0) for i in range(10)],
        schema="g string, x double, y double",
    ).write.parquet(pts)
    out2 = str(tmp_path / "ols")
    _run([
        "analytics", "--keep-session", f"data.input={pts}",
        f"data.out={out2}", "method=ols", "x=x", "y=y", "group=[g]",
    ])
    capsys.readouterr()
    fit = spark.read.parquet(out2).collect()[0]
    assert abs(fit["slope"] - 2.0) < 1e-9


def test_analytics_validation(tmp_path):
    assert main(["analytics"]) != 0  # missing data.input/out
    rc = main([
        "analytics", f"data.input={tmp_path}", f"data.out={tmp_path}/o",
        "method=nope",
    ])
    assert rc != 0

def test_abtest_mean_and_proportion(spark, tmp_path, capsys):
    import numpy as np

    rng = np.random.default_rng(17)
    rows = []
    for v, mu, rate in (("c", 10.0, 0.2), ("t", 11.0, 0.35)):
        for _ in range(300):
            rows.append(
                (v, float(rng.normal(mu, 2.0)),
                 int(rng.random() < rate),
                 float(rng.normal(mu, 2.0)))
            )
    src = str(tmp_path / "ab")
    spark.createDataFrame(
        rows, "variant string, y double, ok int, pre double"
    ).write.parquet(src)

    out = str(tmp_path / "mean")
    _run([
        "analytics", "--keep-session", f"data.input={src}",
        f"data.out={out}", "method=abtest", "metric=y",
        "control=c",
    ])
    r = spark.read.parquet(out).collect()[0]
    assert r["variant"] == "t" and r["significant"] is True

    out2 = str(tmp_path / "prop")
    _run([
        "analytics", "--keep-session", f"data.input={src}",
        f"data.out={out2}", "method=abtest", "metric=ok",
        "control=c", "kind=proportion",
    ])
    r2 = spark.read.parquet(out2).collect()[0]
    assert r2["rate_t"] > r2["rate_c"]

    out3 = str(tmp_path / "cuped")
    _run([
        "analytics", "--keep-session", f"data.input={src}",
        f"data.out={out3}", "method=abtest", "metric=y",
        "control=c", "cuped=pre",
    ])
    assert spark.read.parquet(out3).count() == 1
    capsys.readouterr()


def test_control_charts(spark, tmp_path, capsys):
    src = str(tmp_path / "stream")
    vals = [10.0] * 30 + [11.5] * 30  # persistent 1.5-sigma-ish shift
    spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(vals)],
        "g string, t long, x double",
    ).write.parquet(src)

    out = str(tmp_path / "cusum")
    _run([
        "analytics", "--keep-session", f"data.input={src}",
        f"data.out={out}", "method=control", "chart=cusum",
        "value=x", "order=[t]", "group=[g]",
        "target=10.0", "sigma=1.0",
    ])
    got = spark.read.parquet(out)
    assert got.count() == 60
    assert got.where("cusum_flag").count() > 0

    out2 = str(tmp_path / "ewma")
    _run([
        "analytics", "--keep-session", f"data.input={src}",
        f"data.out={out2}", "method=control", "chart=ewma",
        "value=x", "order=[t]", "group=[g]",
    ])
    assert "ewma_flag" in spark.read.parquet(out2).columns

    # error paths AFTER session creation need --keep-session too: the
    # CLI's finally would stop the module-shared SparkSession otherwise
    assert main([
        "analytics", "--keep-session", f"data.input={src}",
        f"data.out={out}", "method=control", "chart=nope",
        "value=x", "order=[t]",
    ]) != 0
    assert main([
        "analytics", "--keep-session", f"data.input={src}",
        f"data.out={out}", "method=control", "chart=cusum",
    ]) != 0
    capsys.readouterr()


def test_episodes_cli(spark, tmp_path, capsys):
    import datetime as dt

    src = str(tmp_path / "flags")
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("s", t0 + dt.timedelta(minutes=m), m in (0, 10, 200), 1.0 * m)
        for m in range(0, 300, 10)
    ]
    spark.createDataFrame(
        rows, "g string, ts timestamp, fl boolean, x double"
    ).write.parquet(src)
    out = str(tmp_path / "eps")
    _run([
        "analytics", "--keep-session", f"data.input={src}",
        f"data.out={out}", "method=episodes", "flag=fl", "ts=ts",
        "group=[g]", "max_gap=30min", "value=x",
    ])
    got = spark.read.parquet(out).orderBy("episode").collect()
    assert [r["n_rows"] for r in got] == [2, 1]
    assert main([
        "analytics", "--keep-session", f"data.input={src}",
        f"data.out={out}", "method=episodes", "flag=fl",
    ]) != 0
    capsys.readouterr()

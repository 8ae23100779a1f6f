"""Fused chart → episodes → incident-upsert chain
(streaming/incident_chain): the always-on QC monitoring loop as one
checkpointed query (VERDICT r8 item 6), with the runbook's
kill/restart-mid-open-incident drill and batch parity against
operators/cusum → operators/episodes."""

import datetime as dt

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.cusum import cusum_anomaly
from qualityassurancetool_spark.operators.episodes import flag_episodes
from qualityassurancetool_spark.streaming.incident_chain import (
    start_incident_upsert,
    streaming_cusum_episodes,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)
SCHEMA = "g string, ts timestamp, v double"
KW = dict(target=10.0, sigma=1.0, slack=0.5, threshold=5.0)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def _rows(spec):
    """spec: list of (stream, t_sec, value)."""
    return [(g, _ts(t), v) for g, t, v in spec]


def _write(spark, path, rows, mode="overwrite"):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        mode
    ).parquet(path)


def _run_chain(spark, land, ckpt, table, **chain_kw):
    stream = spark.readStream.schema(SCHEMA).parquet(land)
    incidents = streaming_cusum_episodes(
        stream, "v", "ts", "g", **{**KW, **chain_kw}
    )
    q = start_incident_upsert(
        incidents, table, ckpt + "_sink", available_now=True
    )
    q.awaitTermination(180)


def _batch_map(spark, rows, max_gap="10s", min_rows=1):
    chart = cusum_anomaly(
        spark.createDataFrame(rows, SCHEMA), "v", ["ts"], ["g"], **KW
    ).withColumn(
        "excursion", F.greatest("cusum_pos", "cusum_neg")
    )
    eps = flag_episodes(
        chart, "cusum_flag", "ts", ["g"],
        value_col="excursion", max_gap=max_gap, min_rows=min_rows,
    )
    return {
        (r["g"], r["episode"]): r
        for r in eps.withColumn("s_us", F.unix_micros("start"))
        .withColumn("e_us", F.unix_micros("end"))
        .collect()
    }


# a stream whose values sit at target=10 except two planted shifts.
# The first shift is SHORT (t=20,21 at 15: sp reaches 9.0, flags from
# t=21) so the statistic decays back under h=5 by t=30 — the flags
# stop, and the >10s quiet stretch before the second shift is what
# closes episode 1 when t=60's flagged row arrives.  A sustained shift
# would keep sp above h through any healthy stretch and the incident
# would (correctly) never close.
PART1 = _rows(
    [("a", float(i), 15.0 if i in (20, 21) else 10.0) for i in range(40)]
    + [("b", float(i), 10.0) for i in range(40)]  # healthy stream
)
PART2 = _rows(
    [("a", 40.0 + i, 10.0) for i in range(15)]
    + [("a", 60.0 + i, 16.0) for i in range(5)]   # second incident
    + [("b", 40.0 + i, 10.0) for i in range(10)]
)


def test_kill_restart_mid_open_incident(spark, tmp_path):
    """The runbook drill (docs/OPERATIONS.md): the driver dies while an
    incident is OPEN; on restart from the same checkpoint the chain
    re-emits the still-open incident, later closes it, and the incident
    table converges to exactly the batch chain's episodes."""
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "incidents")

    _write(spark, land, PART1)
    _run_chain(spark, land, ckpt, table, max_gap="10s")
    # the planted shift has crossed threshold and is mid-incident: the
    # table must show it open (the "kill" = the availableNow query
    # terminating with state checkpointed; nothing is flushed/closed)
    state1 = {
        (r["stream"], r["episode"]): r
        for r in spark.read.parquet(table).collect()
    }
    assert set(state1) == {("a", 1)}
    assert state1[("a", 1)]["open"] is True
    n_rows_1 = state1[("a", 1)]["n_rows"]
    assert n_rows_1 >= 1

    # restart: new data arrives (healthy gap closes incident 1, a new
    # shift opens incident 2) — the SAME checkpoint continues the state
    _write(spark, land, PART2, mode="append")
    _run_chain(spark, land, ckpt, table, max_gap="10s")

    final = {
        (r["stream"], r["episode"]): r
        for r in spark.read.parquet(table).collect()
    }
    want = _batch_map(spark, PART1 + PART2, max_gap="10s")
    assert set(final) == set(want) == {("a", 1), ("a", 2)}
    assert final[("a", 1)]["open"] is False  # closed across the restart
    assert final[("a", 2)]["open"] is True
    for k, r in final.items():
        w = want[k]
        assert r["start_us"] == w["s_us"] and r["end_us"] == w["e_us"]
        assert r["n_rows"] == w["n_rows"]
        assert r["peak_value"] == w["peak_value"]
    # the open incident survived the restart AND kept growing: its
    # closed form covers at least the pre-restart rows
    assert final[("a", 1)]["n_rows"] >= n_rows_1


def test_sink_replay_converges(spark, tmp_path):
    """Replaying the same batch through the upsert sink rewrites the
    same (stream, episode) keys — the crash-between-commit-and-
    checkpoint case converges instead of duplicating incidents."""
    land = str(tmp_path / "land")
    table = str(tmp_path / "incidents")
    _write(spark, land, PART1)
    # two drains with DIFFERENT checkpoints = the worst case: the
    # second run replays every batch from scratch against a sink that
    # already holds the first run's rows
    _run_chain(spark, land, str(tmp_path / "ck1"), table, max_gap="10s")
    first = sorted(
        map(tuple, spark.read.parquet(table).collect())
    )
    _run_chain(spark, land, str(tmp_path / "ck2"), table, max_gap="10s")
    second = sorted(
        map(tuple, spark.read.parquet(table).collect())
    )
    assert first == second


def test_ewma_chain_parity_and_restart(spark, tmp_path):
    """The EWMA variant of the fused chain: same EpisodeFold, the
    standalone chart's EwmaStep recurrence — final incidents equal the
    batch ewma_anomaly → flag_episodes chain with value=abs(ewma_dev),
    across a checkpoint restart."""
    from qualityassurancetool_spark.operators.ewma import ewma_anomaly
    from qualityassurancetool_spark.streaming.incident_chain import (
        streaming_ewma_episodes,
    )

    # steady 10s with two sharp level pops (EWMA flags transitions, not
    # sustained levels — each pop is a short incident)
    p1 = _rows(
        [("a", float(i), 40.0 if i in (20, 21) else 10.0)
         for i in range(40)]
    )
    p2 = _rows(
        [("a", 40.0 + i, 10.0) for i in range(15)]
        + [("a", 60.0 + i, 45.0 if i < 2 else 10.0) for i in range(5)]
    )
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "incidents")
    kw = dict(alpha=0.3, window=8, nsigma=3.0, min_history=4)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(land)
        q = start_incident_upsert(
            streaming_ewma_episodes(
                stream, "v", "ts", "g", max_gap="10s", **kw
            ),
            table,
            ckpt + "_sink",
            available_now=True,
        )
        q.awaitTermination(180)

    _write(spark, land, p1)
    run()
    _write(spark, land, p2, mode="append")
    run()

    final = {
        (r["stream"], r["episode"]): r
        for r in spark.read.parquet(table).collect()
    }
    chart = ewma_anomaly(
        spark.createDataFrame(p1 + p2, SCHEMA), "v", ["ts"], ["g"], **kw
    ).withColumn("mag", F.abs("ewma_dev"))
    eps = flag_episodes(
        chart, "ewma_flag", "ts", ["g"], value_col="mag", max_gap="10s"
    )
    want = {
        (r["g"], r["episode"]): r
        for r in eps.withColumn("s_us", F.unix_micros("start"))
        .withColumn("e_us", F.unix_micros("end"))
        .collect()
    }
    assert set(final) == set(want) and len(want) >= 2
    for k, r in final.items():
        w = want[k]
        assert r["start_us"] == w["s_us"] and r["end_us"] == w["e_us"]
        assert r["n_rows"] == w["n_rows"]
        assert r["peak_value"] == w["peak_value"]


def test_monitor_cli_cron_pattern(spark, tmp_path, capsys):
    """`monitor` drives the fused chain from the command line: two
    invocations with the same checkpoint behave like two cron ticks —
    the second drains only the new files and carries the chart +
    open-episode state forward."""
    from qualityassurancetool_spark.cli import main

    land = str(tmp_path / "land")
    table = str(tmp_path / "incidents")
    argv = [
        "monitor", "--keep-session", f"data.input={land}",
        f"data.out={table}", "chart=cusum", "value=v", "ts=ts",
        "group=g", "target=10.0", "sigma=1.0", "max_gap=10s",
    ]
    _write(spark, land, PART1)
    assert main(argv) == 0
    rep1 = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert (int(rep1["incidents"]), int(rep1["open"])) == (1, 1)

    _write(spark, land, PART2, mode="append")
    assert main(argv) == 0
    rep2 = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert (int(rep2["incidents"]), int(rep2["open"])) == (2, 1)

    # the ewma chart branch runs through the same CLI surface
    table2 = str(tmp_path / "incidents_ewma")
    assert main([
        "monitor", "--keep-session", f"data.input={land}",
        f"data.out={table2}", "chart=ewma", "value=v", "ts=ts",
        "group=g", "alpha=0.3", "window=8", "max_gap=10s",
    ]) == 0
    rep3 = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert int(rep3["incidents"]) >= 1

    # unknown chart is a pointed ConfigError (exit code 2)
    assert main(
        ["monitor", f"data.input={land}", f"data.out={table}",
         "chart=shewhart"]
    ) == 2
    capsys.readouterr()


def test_monitor_cli_ts_unit_integer_column(spark, tmp_path, capsys):
    """ts_unit= converts an integer epoch column stream-side (the
    driver-layout self-heal): epoch-second longs under ts_unit=s give
    real timestamps, so max_gap applies in real time; an unknown unit
    is a pointed ConfigError."""
    from qualityassurancetool_spark.cli import main

    land = str(tmp_path / "land")
    table = str(tmp_path / "incidents")
    rows = [("a", 1700000000 + i, 15.0 if 5 <= i < 10 else 10.0)
            for i in range(20)]
    spark.createDataFrame(
        rows, "g string, ts long, v double"
    ).coalesce(1).write.parquet(land)
    assert main([
        "monitor", "--keep-session", f"data.input={land}",
        f"data.out={table}", "chart=cusum", "value=v", "ts=ts",
        "ts_unit=s", "group=g", "target=10.0", "sigma=1.0",
        "max_gap=5s",
    ]) == 0
    rep = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert int(rep["incidents"]) >= 1
    assert main([
        "monitor", f"data.input={land}", f"data.out={table}",
        "chart=cusum", "value=v", "ts=ts", "ts_unit=fortnights",
        "group=g", "target=10.0", "sigma=1.0",
    ]) == 2
    capsys.readouterr()


def test_chain_validation(spark, tmp_path):
    land = str(tmp_path / "land")
    _write(spark, land, PART1)
    stream = spark.readStream.schema(SCHEMA).parquet(land)
    import pytest

    with pytest.raises(ValueError, match="sigma"):
        streaming_cusum_episodes(
            stream, "v", "ts", "g", target=10.0, sigma=0.0
        )
    with pytest.raises(ValueError, match="max_gap"):
        streaming_cusum_episodes(
            stream, "v", "ts", "g", target=10.0, sigma=1.0, max_gap=0
        )
    with pytest.raises(ValueError, match="min_rows"):
        streaming_cusum_episodes(
            stream, "v", "ts", "g", target=10.0, sigma=1.0, min_rows=0
        )


def test_monitor_cli_zero_microbatch_reports_zero(spark, tmp_path, capsys):
    """An availableNow tick that drains ZERO micro-batches never writes
    the sink path; reading it raised AnalysisException instead of
    reporting an empty table (advisor finding, round 9).  Reproduced by
    retargeting data.out under an already-drained checkpoint — the cron
    shape after an output archive/rotate with no new input files."""
    from qualityassurancetool_spark.cli import main

    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, land, PART1)
    base = [
        "monitor", "--keep-session", f"data.input={land}",
        f"checkpoint={ckpt}", "chart=cusum", "value=v", "ts=ts",
        "group=g", "target=10.0", "sigma=1.0", "max_gap=10s",
    ]
    assert main(base + [f"data.out={tmp_path / 'incidents_a'}"]) == 0
    capsys.readouterr()

    # same checkpoint, no new files, fresh out path: zero batches fire
    assert main(base + [f"data.out={tmp_path / 'incidents_b'}"]) == 0
    rep = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert (int(rep["incidents"]), int(rep["open"])) == (0, 0)


def _seasonal_rows(day: int, planted: dict):
    """One day of hourly readings for stream 'a': value = the cell's
    baseline mean unless planted[hour] overrides it."""
    return [
        (
            "a",
            T0 + dt.timedelta(days=day, hours=h),
            planted.get(h, 10.0 + 0.1 * h),
        )
        for h in range(24)
    ]


def test_seasonal_chain_parity_and_restart(spark, tmp_path):
    """The seasonal variant of the fused chain (VERDICT r9 item 3): a
    history-fit phase profile broadcast into the operator closure, the
    same EpisodeFold, O(streams) state.  Final incidents equal the
    batch seasonal_zscore(baseline=profile) -> flag_episodes chain with
    value=abs(seasonal_dev), across a checkpoint restart that leaves an
    incident open mid-kill."""
    from qualityassurancetool_spark.operators.seasonal import (
        seasonal_profile,
        seasonal_zscore,
    )
    from qualityassurancetool_spark.streaming.incident_chain import (
        streaming_seasonal_episodes,
    )

    # 14 days of history per hour cell, alternating +-0.5 jitter so
    # every cell has a real sigma
    hist_rows = [
        (
            "a",
            T0 + dt.timedelta(days=d, hours=h),
            10.0 + 0.1 * h + (0.5 if d % 2 else -0.5),
        )
        for d in range(14)
        for h in range(24)
    ]
    hist = spark.createDataFrame(hist_rows, SCHEMA)
    prof = seasonal_profile(hist, "v", "ts", ["g"], period="hour_of_day")

    # day 15: hours 5-6 blow out their cells (episode 1, open at EOD);
    # day 16: hours 10-11 (episode 2) — the 28h quiet gap closes ep 1
    p1 = _seasonal_rows(15, {5: 60.0, 6: 60.0})
    p2 = _seasonal_rows(16, {10: 60.0, 11: 60.0})

    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "incidents")
    kw = dict(period="hour_of_day", nsigma=3.0, min_samples=5)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(land)
        q = start_incident_upsert(
            streaming_seasonal_episodes(
                stream, prof, "v", "ts", "g", max_gap="2h", **kw
            ),
            table,
            ckpt + "_sink",
            available_now=True,
        )
        q.awaitTermination(180)

    _write(spark, land, p1)
    run()
    mid = {
        (r["stream"], r["episode"]): r
        for r in spark.read.parquet(table).collect()
    }
    assert set(mid) == {("a", 1)} and mid[("a", 1)]["open"] is True

    _write(spark, land, p2, mode="append")
    run()
    final = {
        (r["stream"], r["episode"]): r
        for r in spark.read.parquet(table).collect()
    }

    chart = seasonal_zscore(
        spark.createDataFrame(p1 + p2, SCHEMA), "v", "ts", ["g"],
        baseline=prof, **kw,
    ).withColumn("mag", F.abs("seasonal_dev"))
    eps = flag_episodes(
        chart, "seasonal_flag", "ts", ["g"], value_col="mag",
        max_gap="2h",
    )
    want = {
        (r["g"], r["episode"]): r
        for r in eps.withColumn("s_us", F.unix_micros("start"))
        .withColumn("e_us", F.unix_micros("end"))
        .collect()
    }
    assert set(final) == set(want) == {("a", 1), ("a", 2)}
    assert final[("a", 1)]["open"] is False
    assert final[("a", 2)]["open"] is True
    for k, r in final.items():
        w = want[k]
        assert r["start_us"] == w["s_us"] and r["end_us"] == w["e_us"]
        assert r["n_rows"] == w["n_rows"]
        assert r["peak_value"] == w["peak_value"]

    # a profile frame with the wrong shape fails loudly
    import pytest

    with pytest.raises(ValueError, match="seasonal_profile"):
        streaming_seasonal_episodes(
            spark.readStream.schema(SCHEMA).parquet(land),
            prof.drop("sum_x2"), "v", "ts", "g", **kw,
        )


def test_monitor_cli_seasonal_chart(spark, tmp_path, capsys):
    """`monitor chart=seasonal history=<parquet>` fits the phase profile
    on the history table and drives the fused chain; omitting both
    history= and profile= is a pointed ConfigError."""
    from qualityassurancetool_spark.cli import main

    hist_rows = [
        (
            "a",
            T0 + dt.timedelta(days=d, hours=h),
            10.0 + 0.1 * h + (0.5 if d % 2 else -0.5),
        )
        for d in range(14)
        for h in range(24)
    ]
    hist_path = str(tmp_path / "hist")
    _write(spark, hist_path, hist_rows)
    land = str(tmp_path / "land")
    _write(spark, land, _seasonal_rows(15, {5: 60.0, 6: 60.0}))
    table = str(tmp_path / "incidents")
    assert main([
        "monitor", "--keep-session", f"data.input={land}",
        f"data.out={table}", "chart=seasonal", f"history={hist_path}",
        "value=v", "ts=ts", "group=g", "max_gap=2h",
    ]) == 0
    rep = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert (int(rep["incidents"]), int(rep["open"])) == (1, 1)

    assert main([
        "monitor", f"data.input={land}", f"data.out={table}",
        "chart=seasonal", "value=v", "ts=ts", "group=g",
    ]) == 2
    capsys.readouterr()


def test_seasonal_profile_period_stamp_guard(spark, tmp_path):
    """A stored profile scored under a DIFFERENT period hits wrong
    phase cells silently (hour_of_day's 0-23 all exist inside
    hour_of_week's 0-167) — the round-10 period stamp makes both the
    batch and streaming scorers refuse the mismatch; unstamped
    (pre-round-10) profiles still pass."""
    import pytest

    from qualityassurancetool_spark.operators.seasonal import (
        seasonal_profile,
        seasonal_zscore,
    )
    from qualityassurancetool_spark.streaming.incident_chain import (
        streaming_seasonal_episodes,
    )

    hist = spark.createDataFrame(
        [("a", T0 + dt.timedelta(days=d, hours=h), 10.0 + h)
         for d in range(7) for h in range(24)],
        SCHEMA,
    )
    prof = seasonal_profile(hist, "v", "ts", ["g"], period="hour_of_week")
    assert prof.columns[-1] == "period"

    with pytest.raises(ValueError, match="period"):
        seasonal_zscore(
            hist, "v", "ts", ["g"], baseline=prof, period="hour_of_day"
        )
    land = str(tmp_path / "land")
    _write(spark, land, _seasonal_rows(8, {}))
    stream = spark.readStream.schema(SCHEMA).parquet(land)
    with pytest.raises(ValueError, match="period"):
        streaming_seasonal_episodes(
            stream, prof, "v", "ts", "g", period="hour_of_day"
        )
    # matching period passes both
    seasonal_zscore(
        hist, "v", "ts", ["g"], baseline=prof, period="hour_of_week"
    ).count()
    # unstamped legacy profile: no validation possible, no refusal
    legacy = prof.drop("period")
    seasonal_zscore(
        hist, "v", "ts", ["g"], baseline=legacy, period="hour_of_day"
    ).count()

    # the CLI rejects a bad period BEFORE building a session
    from qualityassurancetool_spark.cli import main

    assert main([
        "monitor", f"data.input={land}", "data.out=/tmp/x",
        "chart=seasonal", f"history={land}", "period=hourly",
    ]) == 2


def test_seasonal_baseline_extra_columns_refused(spark, tmp_path):
    """A profile grouped by EXTRA columns (e.g. [g, g2]) has every
    required column, so the missing-columns check passes — but the
    streaming scorer's dict keyed on (group, cell) would silently
    overwrite duplicate keys and score against an arbitrary survivor
    (advisor finding, round 11).  Unexpected columns must refuse
    loudly, like the period stamp."""
    import pytest

    from qualityassurancetool_spark.operators.seasonal import (
        seasonal_profile,
    )
    from qualityassurancetool_spark.streaming.incident_chain import (
        streaming_seasonal_episodes,
    )

    hist = spark.createDataFrame(
        [
            ("a", "x", T0 + dt.timedelta(days=d, hours=h), 10.0 + h)
            for d in range(7)
            for h in range(24)
        ],
        "g string, g2 string, ts timestamp, v double",
    )
    prof2 = seasonal_profile(
        hist, "v", "ts", ["g", "g2"], period="hour_of_day"
    )
    land = str(tmp_path / "land")
    _write(spark, land, _seasonal_rows(8, {}))
    stream = spark.readStream.schema(SCHEMA).parquet(land)
    with pytest.raises(ValueError, match="unexpected columns"):
        streaming_seasonal_episodes(
            stream, prof2, "v", "ts", "g", period="hour_of_day"
        )
    # the single-group profile (with its period stamp) still passes
    prof1 = seasonal_profile(hist, "v", "ts", ["g"], period="hour_of_day")
    streaming_seasonal_episodes(
        stream, prof1, "v", "ts", "g", period="hour_of_day"
    )


def test_seasonal_profile_refresh_lifecycle(spark, tmp_path):
    """seasonal_profile_refresh (round-11): tick-counted refit cadence
    persisted in the store's meta — bootstrap on the first tick, zero
    history scans on non-due ticks, refit when refit_every is due, one
    live version after every commit, and the period stamp surviving
    every reload."""
    import os

    import pytest

    from qualityassurancetool_spark.operators.seasonal import (
        seasonal_profile,
        seasonal_profile_refresh,
    )

    hist = spark.createDataFrame(
        [("a", T0 + dt.timedelta(days=d, hours=h), 10.0 + 0.1 * h)
         for d in range(7) for h in range(24)],
        SCHEMA,
    )
    calls = {"n": 0}

    def fit():
        calls["n"] += 1
        return seasonal_profile(hist, "v", "ts", ["g"])

    store = str(tmp_path / "store")

    def tick(**kw):
        return seasonal_profile_refresh(
            spark, store, fit, period="hour_of_day", **kw
        )

    df, info = tick(refit_every=3)
    assert (info["action"], info["tick"], calls["n"]) == ("bootstrap", 1, 1)
    assert df.select("period").distinct().collect()[0][0] == "hour_of_day"

    df, info = tick(refit_every=3)
    assert (info["action"], calls["n"]) == ("kept", 1)
    df, info = tick(refit_every=3)
    assert (info["action"], calls["n"]) == ("kept", 1)
    # the stamp survives the store round trip on a no-fit tick
    assert df.select("period").distinct().collect()[0][0] == "hour_of_day"

    df, info = tick(refit_every=3)
    assert (info["action"], info["tick"], calls["n"]) == ("refit", 4, 2)
    assert info["fitted_tick"] == 4
    # exactly one live version after the commit prunes the superseded one
    assert [d for d in os.listdir(store) if d.startswith("profile_v=")] \
        == ["profile_v=4"]

    # a different period against the same store refuses loudly
    with pytest.raises(ValueError, match="period"):
        seasonal_profile_refresh(
            spark, store, fit, period="hour_of_week", refit_every=3
        )


def test_seasonal_profile_refresh_drift_gate(spark, tmp_path):
    """refit_drift: the candidate is fit on cadence but adopted only if
    a well-sampled cell's mean moved — constant-history candidates are
    kept (baseline stability; the zero-sigma cell must yield shift 0,
    not NaN), and a genuinely moved cell (infinite shift vs sigma 0)
    flips the live profile."""
    from qualityassurancetool_spark.operators.seasonal import (
        seasonal_profile,
        seasonal_profile_refresh,
    )

    rows = [
        ("a", T0 + dt.timedelta(days=d, hours=h), 10.0 + h)
        for d in range(7)
        for h in range(24)
    ]
    state = {"hist": spark.createDataFrame(rows, SCHEMA)}
    calls = {"n": 0}

    def fit():
        calls["n"] += 1
        return seasonal_profile(state["hist"], "v", "ts", ["g"])

    store = str(tmp_path / "store")

    def tick():
        return seasonal_profile_refresh(
            spark, store, fit, period="hour_of_day", refit_drift=2.0
        )

    _, info = tick()
    assert info["action"] == "bootstrap"
    # unchanged history: candidate fit (drift gate needs it) but NOT
    # adopted — every cell is constant (sigma 0) and unmoved (shift 0)
    _, info = tick()
    assert (info["action"], calls["n"]) == ("kept_stable", 2)
    assert info["fitted_tick"] == 1

    # shift hour-5's level in the refit window: sigma_old = 0 there, so
    # the shift is infinite -> adopted
    state["hist"] = spark.createDataFrame(
        [
            (g, ts, v + (50.0 if ts.hour == 5 else 0.0))
            for g, ts, v in rows
        ],
        SCHEMA,
    )
    df, info = tick()
    assert (info["action"], info["fitted_tick"]) == ("refit", 3)
    mu5 = df.where("cell = 5").select(
        (F.col("sum_x") / F.col("n")).alias("mu")
    ).collect()[0]["mu"]
    assert mu5 == 65.0


def test_monitor_cli_profile_store_refit(spark, tmp_path, capsys):
    """`monitor chart=seasonal profile_store= refit_every=` end-to-end:
    the cron-shaped ticks bootstrap, keep, then refit the stored
    profile; the refit picks up the updated history and the period
    stamp survives in the live parquet.  Cadence knobs without a store
    (and profile= + profile_store= together) are pointed
    ConfigErrors."""
    from qualityassurancetool_spark.cli import main

    hist = str(tmp_path / "hist")
    _write(
        spark, hist,
        [("a", T0 + dt.timedelta(days=d, hours=h), 10.0 + 0.1 * h)
         for d in range(14) for h in range(24)],
    )
    land = str(tmp_path / "land")
    _write(spark, land, _seasonal_rows(15, {5: 60.0, 6: 60.0}))
    table = str(tmp_path / "incidents")
    store = str(tmp_path / "store")
    base = [
        "monitor", "--keep-session", f"data.input={land}",
        f"data.out={table}", "chart=seasonal", f"history={hist}",
        f"profile_store={store}", "refit_every=2",
        "value=v", "ts=ts", "group=g", "max_gap=2h",
    ]

    def profile_line():
        return [
            line
            for line in capsys.readouterr().out.strip().splitlines()
            if line.startswith("profile: ")
        ][0]

    assert main(base) == 0
    assert profile_line() == "profile: bootstrap (tick 1, fitted tick 1)"
    assert main(base) == 0
    assert profile_line() == "profile: kept (tick 2, fitted tick 1)"

    # move the whole level in history; the due tick must pick it up
    _write(
        spark, hist,
        [("a", T0 + dt.timedelta(days=d, hours=h), 30.0 + 0.1 * h)
         for d in range(14) for h in range(24)],
    )
    assert main(base) == 0
    assert profile_line() == "profile: refit (tick 3, fitted tick 3)"
    import os

    live = [d for d in os.listdir(store) if d.startswith("profile_v=")]
    assert live == ["profile_v=3"]
    prof = spark.read.parquet(os.path.join(store, live[0]))
    assert prof.select("period").distinct().collect()[0][0] \
        == "hour_of_day"
    mu0 = prof.where("cell = 0").select(
        (F.col("sum_x") / F.col("n")).alias("mu")
    ).collect()[0]["mu"]
    assert abs(mu0 - 30.0) < 1e-9

    assert main([
        "monitor", f"data.input={land}", f"data.out={table}",
        "chart=seasonal", f"history={hist}", "refit_every=2",
        "value=v", "ts=ts", "group=g",
    ]) == 2
    assert main([
        "monitor", f"data.input={land}", f"data.out={table}",
        "chart=seasonal", f"history={hist}", "profile=/tmp/nope",
        f"profile_store={store}", "value=v", "ts=ts", "group=g",
    ]) == 2
    capsys.readouterr()


def test_seasonal_profile_refresh_review_fixes(spark, tmp_path, capsys):
    """Round-11 review pass: (a) a NEW well-sampled group adopts
    through the drift gate (the comparison join must not drop unseen
    cells and leave new streams unmonitored); (b) no cadence knob
    means refit-every-tick at the LIBRARY level too, not just the CLI
    default; (c) the meta pointer commits via temp+rename (no .tmp
    survivor); (d) seasonal-only knobs on a cusum monitor raise
    instead of being silently ignored."""
    import os

    from qualityassurancetool_spark.cli import main
    from qualityassurancetool_spark.operators.seasonal import (
        seasonal_profile,
        seasonal_profile_refresh,
    )

    rows_a = [
        ("a", T0 + dt.timedelta(days=d, hours=h), 10.0 + h)
        for d in range(7)
        for h in range(24)
    ]
    state = {"hist": spark.createDataFrame(rows_a, SCHEMA)}

    def fit():
        return seasonal_profile(state["hist"], "v", "ts", ["g"])

    store = str(tmp_path / "store")

    def tick(**kw):
        return seasonal_profile_refresh(
            spark, store, fit, period="hour_of_day", **kw
        )

    _, info = tick(refit_drift=2.0)
    assert info["action"] == "bootstrap"
    _, info = tick(refit_drift=2.0)
    assert info["action"] == "kept_stable"
    # a brand-new group appears in history with full sampling: adopt,
    # even though every EXISTING cell is unmoved
    state["hist"] = spark.createDataFrame(
        rows_a
        + [("b", ts, 99.0 + (1.0 if d % 2 else -1.0))
           for d in range(7) for h in range(24)
           for ts in [T0 + dt.timedelta(days=d, hours=h)]],
        SCHEMA,
    )
    df, info = tick(refit_drift=2.0)
    assert info["action"] == "refit"
    assert df.where("g = 'b'").count() == 24

    # no cadence knob -> refit EVERY tick (library default, not frozen)
    df, info = tick()
    assert info["action"] == "refit"

    # the atomic pointer commit leaves no temp sibling behind
    assert not os.path.exists(os.path.join(store, "profile_meta.json.tmp"))
    assert os.path.exists(os.path.join(store, "profile_meta.json"))

    # seasonal-only knobs on chart=cusum: pointed ConfigError, exit 2
    land = str(tmp_path / "land")
    _write(spark, land, _rows([("a", 0, 10.0)]))
    assert main([
        "monitor", f"data.input={land}",
        f"data.out={tmp_path / 'out'}", "chart=cusum", "target=10.0",
        "sigma=1.0", f"profile_store={store}", "refit_every=7",
        "value=v", "ts=ts", "group=g",
    ]) == 2
    err = capsys.readouterr()
    assert "chart=seasonal" in err.out + err.err

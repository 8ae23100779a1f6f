"""Streaming control charts (streaming/control): row-for-row parity
with the batch operators on ordered arrivals (including NULL-value
carried statistics and the all-NULL prefix), bounded state,
checkpoint-restart continuation."""

import math
import random

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.cusum import cusum_anomaly
from qualityassurancetool_spark.operators.ewma import ewma_anomaly, ewma_smooth
from qualityassurancetool_spark.streaming.control import (
    streaming_cusum,
    streaming_ewma,
)

MU, SD = 20.0, 4.0


def _rows(rng, n, stream, t0=0, shift=0.0):
    return [
        (
            stream,
            t0 + i,
            None
            if rng.random() < 0.08
            else round(rng.gauss(MU + shift, SD), 3),
        )
        for i in range(n)
    ]


def _write(spark, path, rows, mode="overwrite"):
    spark.createDataFrame(
        rows, "g string, t long, x double"
    ).coalesce(1).write.mode(mode).parquet(path)


def _drain(spark, land, ckpt, build, sink_rows):
    stream = spark.readStream.schema("g string, t long, x double").parquet(
        land
    )

    def sink(df, _id):
        sink_rows.extend(df.collect())

    q = (
        build(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_cusum_parity_and_restart(spark, tmp_path):
    rng = random.Random(5)
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    batch1 = (
        [("a", -2, None), ("a", -1, None)]  # all-NULL prefix: chart
        + _rows(rng, 40, "a")               # stays NULL, not 0.0
        + _rows(rng, 40, "b", shift=2.0)
    )
    _write(spark, land, batch1)
    got: list = []
    build = lambda s: streaming_cusum(
        s, "x", "t", "g", target=MU, sigma=SD, slack=0.5, threshold=4.0
    )
    _drain(spark, land, ckpt, build, got)

    # restart over appended files: state continues from the checkpoint
    batch2 = _rows(rng, 30, "a", t0=40, shift=3.0) + _rows(
        rng, 30, "b", t0=40, shift=2.0
    )
    _write(spark, land, batch2, mode="append")
    _drain(spark, land, ckpt, build, got)
    assert len(got) == 142

    want = {
        (r["g"], r["t"]): r
        for r in cusum_anomaly(
            spark.createDataFrame(
                batch1 + batch2, "g string, t long, x double"
            ),
            "x",
            ["t"],
            ["g"],
            target=MU,
            sigma=SD,
            slack=0.5,
            threshold=4.0,
        ).collect()
    }
    for r in got:
        w = want[(r["stream"], r["t"])]
        # NULL-value rows carry the statistic in BOTH paths (and show
        # NULL before any value has been seen) — compared too
        for c in ("cusum_pos", "cusum_neg"):
            if w[c] is None:
                assert r[c] is None or math.isnan(r[c]), (
                    r["stream"], r["t"], c,
                )
            else:
                assert r[c] == pytest.approx(w[c], abs=1e-9), (
                    r["stream"], r["t"], c,
                )
        assert r["cusum_flag"] == w["cusum_flag"]
    # the planted drift actually signals
    assert any(
        r["cusum_flag"] for r in got if r["stream"] == "b"
    )


def test_ewma_parity_and_restart(spark, tmp_path):
    rng = random.Random(17)
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    batch1 = _rows(rng, 35, "a") + _rows(rng, 35, "b")
    _write(spark, land, batch1)
    got: list = []
    build = lambda s: streaming_ewma(
        s, "x", "t", "g", alpha=0.3, window=8, nsigma=2.5,
        min_history=4,
    )
    _drain(spark, land, ckpt, build, got)
    batch2 = _rows(rng, 25, "a", t0=35) + _rows(rng, 25, "b", t0=35)
    _write(spark, land, batch2, mode="append")
    _drain(spark, land, ckpt, build, got)
    assert len(got) == 120

    df = spark.createDataFrame(
        batch1 + batch2, "g string, t long, x double"
    )
    sm = ewma_smooth(df, "x", ["t"], ["g"], alpha=0.3, window=8)
    an = ewma_anomaly(
        sm, "x", ["t"], ["g"], alpha=0.3, window=8, nsigma=2.5,
        min_history=4,
    )
    want = {(r["g"], r["t"]): r for r in an.collect()}
    for r in got:
        w = want[(r["stream"], r["t"])]
        for sc, bc in (
            ("ewma", "ewma"),
            ("ewma_prev", "ewma_prev"),
            ("ewma_sigma", "ewma_sigma"),
            ("ewma_dev", "ewma_dev"),
        ):
            if w[bc] is None:
                assert r[sc] is None or math.isnan(r[sc]), (
                    r["stream"], r["t"], sc,
                )
            else:
                assert r[sc] == pytest.approx(w[bc], abs=1e-9), (
                    r["stream"], r["t"], sc,
                )
        assert r["ewma_flag"] == w["ewma_flag"], (r["stream"], r["t"])


def test_streaming_validation(spark):
    df = spark.createDataFrame([], "g string, t long, x double")
    with pytest.raises(ValueError):
        streaming_cusum(df, "x", "t", "g", target=0.0, sigma=0.0)
    with pytest.raises(ValueError):
        streaming_cusum(
            df, "x", "t", "g", target=0.0, sigma=1.0, threshold=0
        )
    with pytest.raises(ValueError):
        streaming_ewma(df, "x", "t", "g", alpha=0.0)
    with pytest.raises(ValueError):
        streaming_ewma(df, "x", "t", "g", min_history=1)


def test_multichunk_batch_order(spark, tmp_path):
    """Groups larger than one Arrow chunk: the whole per-key batch is
    concatenated and sorted ONCE (per-chunk sorting would feed the
    recurrence out of order).  Forced with a tiny maxRecordsPerBatch
    and a deliberately scrambled input file order."""
    import random as _r

    rng = _r.Random(3)
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    rows = _rows(rng, 400, "a")
    shuffled = rows[:]
    rng.shuffle(shuffled)  # file order != chart order
    _write(spark, land, shuffled)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        got: list = []
        _drain(
            spark, land, ckpt,
            lambda s: streaming_cusum(
                s, "x", "t", "g", target=MU, sigma=SD
            ),
            got,
        )
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert len(got) == 400
    want = {
        r["t"]: r
        for r in cusum_anomaly(
            spark.createDataFrame(rows, "g string, t long, x double"),
            "x", ["t"], ["g"], target=MU, sigma=SD,
        ).collect()
    }
    for r in got:
        w = want[r["t"]]
        if w["cusum_pos"] is None:
            continue
        assert r["cusum_pos"] == pytest.approx(
            w["cusum_pos"], abs=1e-9
        ), r["t"]


def test_timestamp_order_microseconds_and_null_emission(spark, tmp_path):
    """A TIMESTAMP order column must order at MICROsecond resolution (a
    bare long cast truncates to seconds and sub-second rows would tie),
    and NULL input values must re-emit as SQL NULL, not NaN — batch
    parity for both."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    # five rows inside ONE second, deliberately written out of order,
    # plus a NULL value row — microsecond order is the chart order
    rows = [
        ("a", base + dt.timedelta(microseconds=us), v)
        for us, v in [
            (400, 23.0),
            (100, 17.0),
            (300, None),
            (200, 29.0),
            (500, 11.0),
        ]
    ]
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        rows, "g string, ts timestamp, x double"
    ).coalesce(1).write.mode("overwrite").parquet(land)

    got: list = []
    stream = spark.readStream.schema(
        "g string, ts timestamp, x double"
    ).parquet(land)
    q = (
        streaming_cusum(
            stream, "x", "ts", "g", target=MU, sigma=SD
        )
        .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got.sort(key=lambda r: r["t"])
    # microsecond keys survive (all five distinct, ascending)
    ts_us = [r["t"] for r in got]
    assert len(set(ts_us)) == 5 and ts_us == sorted(ts_us)

    # batch twin over the same rows, ordered by the same µs key
    batch = spark.createDataFrame(rows, "g string, ts timestamp, x double")
    expect = (
        cusum_anomaly(
            batch.select(
                "g", F.unix_micros("ts").alias("t"), F.col("x")
            ),
            "x",
            ["t"],
            ["g"],
            target=MU,
            sigma=SD,
        )
        .orderBy("t")
        .collect()
    )
    for g_row, b_row in zip(got, expect):
        assert g_row["cusum_pos"] == pytest.approx(
            b_row["cusum_pos"], rel=1e-12
        ) or (g_row["cusum_pos"] is None and b_row["cusum_pos"] is None)
    # the NULL input row re-emits value as SQL NULL (not NaN)
    null_row = next(r for r in got if r["t"] % 1000 == 300)
    assert null_row["value"] is None

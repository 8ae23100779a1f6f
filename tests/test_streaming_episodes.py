"""Streaming alert episodes (streaming/episodes): closed+open upserts
match the batch gaps-and-islands operator on ordered arrivals,
including the min_rows debounce, dense qualified-episode numbering,
and continuation across a checkpoint restart."""

import datetime as dt

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.episodes import flag_episodes
from qualityassurancetool_spark.streaming.episodes import (
    streaming_episodes,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


SCHEMA = "g string, ts timestamp, flag boolean, v double"


def _write(spark, path, rows, mode="overwrite"):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        mode
    ).parquet(path)


def _drain(spark, land, ckpt, build, sink_rows):
    stream = spark.readStream.schema(SCHEMA).parquet(land)

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


def _upserted(rows):
    """Sink view: last row per (stream, episode) wins."""
    final = {}
    for r in rows:
        final[(r["stream"], r["episode"])] = r
    return final


def _batch_map(spark, rows, **kw):
    out = flag_episodes(
        spark.createDataFrame(rows, SCHEMA),
        "flag",
        "ts",
        ["g"],
        value_col="v",
        **kw,
    )
    return {
        (r["g"], r["episode"]): r
        for r in out.withColumn(
            "s_us", F.unix_micros("start")
        ).withColumn("e_us", F.unix_micros("end")).collect()
    }


def test_parity_debounce_and_restart(spark, tmp_path):
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    # stream a: episode 1 (rows at 0,2,4), blip at 100 (debounced),
    # episode 2 grows across the restart boundary (200,202 | 204,206)
    # stream b: healthy rows only -> no episodes at all
    batch1 = [
        ("a", _ts(0), True, 5.0),
        ("a", _ts(1), False, 99.0),  # healthy row: never closes/joins
        ("a", _ts(2), True, 7.5),
        ("a", _ts(4), True, None),   # null value: n_rows yes, peak no
        ("a", _ts(100), True, 50.0),  # lone blip < min_rows
        ("a", _ts(200), True, 1.0),
        ("a", _ts(202), True, 2.0),
        ("b", _ts(0), False, 1.0),
        ("b", _ts(5), None, 1.0),    # NULL flag = not flagged
        ("b", None, True, 1.0),      # NULL ts ignored
    ]
    _write(spark, land, batch1)
    got: list = []
    build = lambda s: streaming_episodes(  # noqa: E731
        s, "flag", "ts", "g", max_gap="10s", value_col="v", min_rows=2
    )
    _drain(spark, land, ckpt, build, got)

    state1 = _upserted(got)
    # episode 1 closed (rows 0..4), episode 2 open (200..202); the
    # blip at 100 is never emitted and consumed no episode id
    assert set(state1) == {("a", 1), ("a", 2)}
    ep1, ep2 = state1[("a", 1)], state1[("a", 2)]
    assert (ep1["open"], ep2["open"]) == (False, True)
    assert ep1["n_rows"] == 3 and ep1["peak_value"] == 7.5
    assert ep1["duration_s"] == 4.0

    batch2 = [
        ("a", _ts(204), True, 9.0),
        ("a", _ts(206), True, 3.0),
        ("b", _ts(300), True, 2.0),  # b's first flagged row (pre-debounce)
    ]
    _write(spark, land, batch2, mode="append")
    _drain(spark, land, ckpt, build, got)

    final = _upserted(got)
    assert set(final) == {("a", 1), ("a", 2)}
    ep2 = final[("a", 2)]
    assert ep2["open"] and ep2["n_rows"] == 4 and ep2["peak_value"] == 9.0

    # batch parity: closed episodes + final open rows == flag_episodes
    # over the full prefix (b's lone row debounces away there too)
    want = _batch_map(
        spark, batch1 + batch2, max_gap="10s", min_rows=2
    )
    assert set(final) == set(want)
    for k, r in final.items():
        w = want[k]
        assert r["start_us"] == w["s_us"] and r["end_us"] == w["e_us"]
        assert r["n_rows"] == w["n_rows"]
        assert r["duration_s"] == w["duration_s"]
        assert r["peak_value"] == w["peak_value"]


def test_multiple_closes_in_one_batch_and_min_rows_1(spark, tmp_path):
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    rows = [
        ("s", _ts(0), True, 1.0),
        ("s", _ts(30), True, 2.0),   # gap 30 > 5 -> ep1 closes
        ("s", _ts(60), True, 3.0),   # ep2 closes
        ("s", _ts(61), True, 4.0),   # ep3 stays open
    ]
    _write(spark, land, rows)
    got: list = []
    _drain(
        spark,
        land,
        ckpt,
        lambda s: streaming_episodes(
            s, "flag", "ts", "g", max_gap="5s", value_col="v"
        ),
        got,
    )
    final = _upserted(got)
    assert set(final) == {("s", 1), ("s", 2), ("s", 3)}
    assert [final[("s", i)]["open"] for i in (1, 2, 3)] == [
        False,
        False,
        True,
    ]
    want = _batch_map(spark, rows, max_gap="5s")
    for k, r in final.items():
        w = want[k]
        assert (r["start_us"], r["end_us"], r["n_rows"]) == (
            w["s_us"],
            w["e_us"],
            w["n_rows"],
        )


def test_expression_flag_and_no_value_col(spark, tmp_path):
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    rows = [
        ("s", _ts(i), True, float(i)) for i in range(4)
    ]
    _write(spark, land, rows)
    got: list = []
    _drain(
        spark,
        land,
        ckpt,
        lambda s: streaming_episodes(
            s, F.col("v") >= 2.0, "ts", "g", max_gap="2s"
        ),
        got,
    )
    final = _upserted(got)
    assert set(final) == {("s", 1)}
    r = final[("s", 1)]
    assert r["n_rows"] == 2 and r["peak_value"] is None and r["open"]


def test_randomized_multi_drain_parity(spark, tmp_path):
    """Seeded random flag stream over three appends: the sink's final
    upserted view must equal the batch operator over the whole prefix
    on every field (the strongest parity form short of hypothesis —
    streaming drains are too slow for many examples)."""
    import random

    rng = random.Random(11)
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    got: list = []
    build = lambda s: streaming_episodes(  # noqa: E731
        s, "flag", "ts", "g", max_gap="7s", value_col="v", min_rows=2
    )
    all_rows = []
    t_next = {"g1": 0.0, "g2": 0.0}
    for i in range(3):
        chunk = []
        for _ in range(60):
            g = rng.choice(["g1", "g2"])
            t_next[g] += rng.choice([1.0, 2.5, 6.9, 7.0, 7.1, 30.0])
            chunk.append(
                (
                    g,
                    _ts(t_next[g]),
                    rng.random() < 0.55,
                    None if rng.random() < 0.2 else round(
                        rng.uniform(0, 100), 3
                    ),
                )
            )
        all_rows += chunk
        _write(
            spark, land, chunk, mode="overwrite" if i == 0 else "append"
        )
        _drain(spark, land, ckpt, build, got)

    final = _upserted(got)
    want = _batch_map(spark, all_rows, max_gap="7s", min_rows=2)
    # non-last episodes must be closed; the last QUALIFIED episode may
    # be open, or closed if a trailing pre-debounce blip re-opened
    assert set(final) == set(want)
    last_ep = {}
    for (g, ep) in want:
        last_ep[g] = max(last_ep.get(g, 0), ep)
    for k, r in final.items():
        w = want[k]
        assert r["start_us"] == w["s_us"]
        assert r["end_us"] == w["e_us"]
        assert r["n_rows"] == w["n_rows"]
        assert r["peak_value"] == w["peak_value"]
        if k[1] != last_ep[k[0]]:
            assert not r["open"]

"""Structured Streaming surface: the same QC column expressions run under
``readStream`` (reference §2.8 — the cron/overlap orchestration upgraded
to watermarked streams).  File source + availableNow trigger + memory sink
keeps it hermetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import QualityFlags, flag_from_bool, flag_merge
from qualityassurancetool_spark.operators.range_check import out_of_range_bool
from qualityassurancetool_spark.schema import events_as_observations
from qualityassurancetool_spark.streaming.micro_batch import (
    streaming_qc,
    tumbling_flag_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


def _range_qc(df):
    flag = flag_from_bool(
        out_of_range_bool(F.col("result"), F.lit(1.0), F.lit(250.0)),
        flag_on_true=QualityFlags.BAD,
    )
    return df.withColumn("qc_flag", flag_merge(F.col("qc_flag"), flag))


def _landed(spark, tmp_path):
    obs = events_as_observations(spark, SF_DIR)
    path = str(tmp_path / "landed")
    obs.write.parquet(path)
    return obs, path


def test_streaming_qc_matches_batch(spark, tmp_path):
    obs, path = _landed(spark, tmp_path)
    stream = spark.readStream.schema(obs.schema).parquet(path)
    flagged = streaming_qc(stream, _range_qc, watermark="50 minutes")
    q = (
        flagged.select("iot_id", F.col("qc_flag").cast("int").alias("flag"))
        .writeStream.format("memory")
        .queryName("qc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["iot_id"]: r["flag"]
        for r in spark.sql("SELECT * FROM qc_stream").collect()
    }
    want = {
        r["iot_id"]: r["flag"]
        for r in _range_qc(obs)
        .select("iot_id", F.col("qc_flag").cast("int").alias("flag"))
        .collect()
    }
    assert got == want
    assert any(v == int(QualityFlags.BAD) for v in got.values())


def test_tumbling_rollup_stream_matches_batch_window(spark, tmp_path):
    obs, path = _landed(spark, tmp_path)
    stream = spark.readStream.schema(obs.schema).parquet(path)
    rollup = tumbling_flag_rollup(
        _range_qc(stream), window="10 minutes", watermark="50 minutes"
    )
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["start"], r["flag"]): r["n"]
        for r in spark.sql("SELECT * FROM rollup_stream").collect()
    }
    want = {
        (r["start"], r["flag"]): r["n"]
        for r in _range_qc(obs)
        .groupBy(
            F.window("phenomenon_time", "10 minutes").alias("w"),
            F.col("qc_flag").alias("flag"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "flag", "n")
        .collect()
    }
    assert got == want


def test_stateful_running_stats_accumulates_across_runs(spark, tmp_path):
    """applyInPandasWithState: state persists in the checkpoint, so a
    second availableNow run over NEW files continues the counts."""
    from qualityassurancetool_spark.functions.timeutils import epoch_micros
    from qualityassurancetool_spark.streaming.stateful import running_flag_stats

    obs = _range_qc(events_as_observations(spark, SF_DIR)).withColumn(
        "t_us", epoch_micros("phenomenon_time")
    )
    part1 = obs.where(F.col("iot_id") % 2 == 0)
    part2 = obs.where(F.col("iot_id") % 2 == 1)
    land = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    part1.write.parquet(land)

    def run_once(qname):
        stream = spark.readStream.schema(obs.schema).parquet(land)
        latest: dict = {}

        def sink(batch_df, _batch_id):
            for r in batch_df.collect():
                latest[r["observation_type"]] = (r["n_total"], r["n_bad"])

        q = (
            running_flag_stats(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return latest

    got1 = run_once("stats_run1")
    want1 = {
        r["observation_type"]: (r["n"], r["nb"])
        for r in part1.groupBy("observation_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("qc_flag") == 4).cast("long")).alias("nb"),
        )
        .collect()
    }
    assert got1 == want1

    # land more data; the SAME checkpoint continues the state
    part2.write.mode("append").parquet(land)
    got2 = run_once("stats_run2")
    want2 = {
        r["observation_type"]: (r["n"], r["nb"])
        for r in obs.groupBy("observation_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("qc_flag") == 4).cast("long")).alias("nb"),
        )
        .collect()
    }
    assert got2 == want2
    assert any(v[1] > 0 for v in got2.values())  # some BAD rows exist


def test_watermark_late_data_discipline(spark, tmp_path):
    """The watermark IS the reference's overlap knob (§2.8): a row that
    arrives late while its window is still open (window end > watermark)
    is folded in; once the watermark passes the window's end the window
    emits exactly once (append mode) and later rows for it are dropped —
    Spark drops a late row iff its ENTIRE window is behind the watermark,
    not merely when the row's own timestamp is.

    Three checkpointed availableNow runs over one landing dir:
      run 1: 3 on-time rows in window A [10:00,10:10) + an advancer at
             10:15 → watermark 10:05, window A still open, nothing emits
      run 2: late row at 10:06 (behind max event time 10:15, but window A
             end 10:10 > watermark) → accepted; advancer at 10:21 →
             watermark 10:11 closes window A → emits n=4
      run 3: too-late row at 10:03 (window A end 10:10 ≤ watermark 10:11)
             → dropped; window A is never re-emitted or updated
    """
    import datetime as dt

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("phenomenon_time", T.TimestampType()),
            T.StructField("qc_flag", T.IntegerType()),
        ]
    )

    def rows(*hm):
        base = dt.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(base + dt.timedelta(hours=h, minutes=m), 0) for h, m in hm],
            schema,
        )

    land = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    emitted: list = []

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        rollup = tumbling_flag_rollup(
            stream, window="10 minutes", watermark="10 minutes"
        )

        def sink(batch_df, _batch_id):
            emitted.extend(batch_df.collect())

        q = (
            rollup.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rows((10, 0), (10, 2), (10, 4), (10, 15)).write.parquet(land)
    run_once()
    window_a = dt.datetime(2024, 1, 1, 10, 0)
    assert not [r for r in emitted if r["start"] == window_a]  # still open

    # late row (window still open) + advancer that closes window A
    rows((10, 6), (10, 21)).write.mode("append").parquet(land)
    run_once()
    got = [r for r in emitted if r["start"] == window_a]
    assert len(got) == 1
    assert got[0]["n"] == 4  # 3 on-time + 1 late-within-open-window

    # too-late: window A's end is now behind the watermark → dropped
    rows((10, 3)).write.mode("append").parquet(land)
    run_once()
    got = [r for r in emitted if r["start"] == window_a]
    assert len(got) == 1  # never re-emitted or updated
    assert got[0]["n"] == 4


def test_streaming_dedup_drops_overlap_redeliveries(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a file stream containing the
    same rows twice (simulated overlap re-cover) yields each id once."""
    from qualityassurancetool_spark.streaming.stateful import streaming_dedup

    obs = events_as_observations(spark, SF_DIR).limit(500)
    land = str(tmp_path / "landed")
    obs.write.parquet(land)
    obs.write.mode("append").parquet(land)  # the overlap re-delivery
    stream = spark.readStream.schema(obs.schema).parquet(land)
    q = (
        streaming_dedup(stream, ["iot_id"])
        .select("iot_id")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["iot_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()]
    assert len(got) == 500
    assert len(set(got)) == 500


def test_foreachbatch_upsert_reflags_only_replayed_days(spark, tmp_path):
    """The streaming flag sink: first run lands flags partitioned by day;
    re-delivering one day's data (the overlap re-run) overwrites exactly
    that day's partition, leaving the other day's files untouched."""
    import datetime as dt
    import os

    from qualityassurancetool_spark.streaming.micro_batch import (
        start_flags_upsert,
    )

    src = str(tmp_path / "src")
    flags = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt")
    schema = "iot_id long, result double, phenomenon_time timestamp, qc_flag tinyint"
    d1 = dt.datetime(2024, 1, 1, 12, 0)
    d2 = dt.datetime(2024, 1, 2, 12, 0)
    spark.createDataFrame(
        [(1, 5.0, d1, 0), (2, 500.0, d1, 0), (3, 5.0, d2, 0)], schema
    ).write.parquet(src)

    def run():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        flagged = streaming_qc(stream, _range_qc, watermark="50 minutes")
        q = start_flags_upsert(flagged, flags, ckpt)
        q.awaitTermination(120)

    run()
    first = {
        r["iot_id"]: r["qc_flag"]
        for r in spark.read.parquet(flags).collect()
    }
    assert first == {1: 0, 2: 4, 3: 0}
    day2_files = {
        f for f in os.listdir(os.path.join(flags, "flag_date=2024-01-02"))
        if f.endswith(".parquet")
    }

    # overlap re-delivery: day-1 rows re-arrive, one with a changed value
    spark.createDataFrame(
        [(1, 900.0, d1, 0), (2, 500.0, d1, 0)], schema
    ).write.mode("append").parquet(src)
    run()
    second = {
        r["iot_id"]: r["qc_flag"]
        for r in spark.read.parquet(flags).collect()
    }
    assert second == {1: 4, 2: 4, 3: 0}  # day-1 re-flagged
    day2_after = {
        f for f in os.listdir(os.path.join(flags, "flag_date=2024-01-02"))
        if f.endswith(".parquet")
    }
    assert day2_after == day2_files  # day-2 partition untouched


def test_streaming_session_window_matches_batch_sessionize(spark, tmp_path):
    import datetime as dt

    from qualityassurancetool_spark.operators.sessionize import session_stats
    from qualityassurancetool_spark.streaming.micro_batch import (
        streaming_session_stats,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(minutes=5)),
        (3, 1, t0 + dt.timedelta(hours=3)),   # new session
        (4, 2, t0 + dt.timedelta(minutes=1)),
    ]
    schema = "event_id long, user_id long, ts timestamp"
    src = str(tmp_path / "sessions_src")
    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = streaming_session_stats(stream, gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    assert got == {
        (1, t0): 2,
        (1, t0 + dt.timedelta(hours=3)): 1,
        (2, t0 + dt.timedelta(minutes=1)): 1,
    }

    # batch twin agrees on session membership counts
    batch = session_stats(
        spark.createDataFrame(rows, schema),
        gap="30min",
        order_extra=["event_id"],
    )
    batch_counts = sorted(
        (r["user_id"], r["n_events"]) for r in batch.collect()
    )
    assert batch_counts == sorted((u, n) for (u, _s), n in got.items())


def test_stream_asof_matches_batch_nearest(spark, tmp_path):
    """Stream-stream interval join + min(struct) nearest-pick must agree
    with the batch as-of operator on matched pairs."""
    import datetime as dt

    from qualityassurancetool_spark.operators.asof import asof_nearest_join
    from qualityassurancetool_spark.streaming.stream_asof import (
        stream_asof_nearest,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    dep_rows = [
        (1, ts(10.0)), (2, ts(20.0)), (3, ts(95.0)), (4, ts(300.0)),
        # far-future heartbeat: advances the watermark past dep 4's
        # aggregation window so append mode emits it; no partner in tol,
        # so the inner join never surfaces it
        (99, ts(1000.0)),
    ]
    ind_rows = [
        (100, ts(9.4), 7.0),    # within tol of dep 1 (0.6s)
        (101, ts(10.2), 8.0),   # nearer to dep 1 (0.2s) -> wins
        (102, ts(20.0), 9.0),   # exact match dep 2
        (103, ts(96.1), 1.5),   # 1.1s from dep 3 -> out of tol (1s)
        (104, ts(299.5), 2.5),  # within tol of dep 4
        (199, ts(1500.0), 0.0),  # heartbeat for the independent side
    ]
    dep_schema = "iot_id long, phenomenon_time timestamp"
    ind_schema = "iot_id long, phenomenon_time timestamp, result double"
    dsrc, isrc = str(tmp_path / "dep"), str(tmp_path / "ind")
    spark.createDataFrame(dep_rows, dep_schema).write.parquet(dsrc)
    spark.createDataFrame(ind_rows, ind_schema).write.parquet(isrc)

    dep_s = spark.readStream.schema(dep_schema).parquet(dsrc)
    ind_s = spark.readStream.schema(ind_schema).parquet(isrc)
    out = stream_asof_nearest(
        dep_s, ind_s, tolerance=1.0, watermark="10 seconds",
        ind_payload=["result"],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["dep_id"]: (r["ind_id"], r["abs_dt_s"], r["ind_result"])
        for r in spark.sql("SELECT * FROM asof_stream").collect()
    }
    # dep 1 -> nearest is 101 (0.2s); dep 2 -> exact 102; dep 3 unmatched
    # (1.1s > tol); dep 4 -> 104
    assert got == {
        1: (101, 0.2, 8.0),
        2: (102, 0.0, 9.0),
        4: (104, 0.5, 2.5),
    }

    # batch operator agrees on every matched pair
    batch = asof_nearest_join(
        spark.createDataFrame(dep_rows, dep_schema),
        spark.createDataFrame(ind_rows, ind_schema),
        tolerance=1.0,
    )
    batch_matched = {
        r["iot_id"]: r["ind_iot_id"]
        for r in batch.collect()
        if r["ind_iot_id"] is not None
    }
    assert batch_matched == {k: v[0] for k, v in got.items()}


def test_same_day_micro_batches_merge_not_clobber(spark, tmp_path):
    """Two micro-batches sharing a day must BOTH survive in the flags
    table: the sink merges rows (the reference PATCHes per
    observation), it does not day-overwrite (review finding, round 8 —
    batch 2 used to delete batch 1's same-day flags)."""
    import datetime as dt

    from qualityassurancetool_spark.streaming.micro_batch import (
        start_flags_upsert,
    )

    src = str(tmp_path / "src")
    flags = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "iot_id long, result double, phenomenon_time timestamp,"
        " qc_flag tinyint"
    )
    day = dt.datetime(2024, 3, 1, 8, 0)

    def run():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        flagged = streaming_qc(stream, _range_qc, watermark="50 minutes")
        q = start_flags_upsert(flagged, flags, ckpt)
        q.awaitTermination(120)

    spark.createDataFrame([(1, 5.0, day, 0), (2, 500.0, day, 0)], schema) \
        .write.parquet(src)
    run()
    # batch 2: MORE rows for the SAME day, plus a re-flag of id 1
    spark.createDataFrame(
        [(3, 5.0, day + dt.timedelta(hours=4), 0), (1, 600.0, day, 0)],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    back = {
        r["iot_id"]: r["qc_flag"]
        for r in spark.read.parquet(flags).collect()
    }
    # id 2 (batch 1 only) SURVIVES; id 1 took the batch-2 re-flag
    assert back == {1: 4, 2: 4, 3: 0}


def test_windowed_cli_run_sub_day_windows_keep_all_flags(spark, tmp_path):
    """The batch runner with sub-day windows (the reference's normal
    10-min cadence): every window's flags must survive — the per-day
    overwrite deleted all but the last window of each day."""
    import duckdb
    import yaml

    from qualityassurancetool_spark.cli import main

    flags_out = str(tmp_path / "flags_subday")
    cfg = tmp_path / "qc_subday.yaml"
    cfg.write_text(yaml.safe_dump({
        "QC": [
            {"id": t, "range": {"min": 0.0, "max": 400.0}}
            for t in ["click", "purchase", "view", "signup", "error"]
        ],
    }))
    rc = main([
        "run", "-c", str(cfg), "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=events",
        f"data.flags_out={flags_out}",
        "time.start=2024-01-01T00:00:00", "time.end=2024-01-02T00:00:00",
        "time.window=720min",   # TWO windows inside one day
    ])
    assert rc == 0
    n_rows = spark.read.parquet(flags_out).count()
    exp = duckdb.connect().execute(
        "SELECT count(*) FROM '/root/testdata/sf0.001/events.parquet' "
        "WHERE ts >= '2024-01-01' AND ts < '2024-01-02'"
    ).fetchone()[0]
    assert n_rows == exp  # both windows' flags present, no clobber


def test_iter_windows_rejects_nonpositive_width(spark):
    import datetime as dt

    import pytest

    from qualityassurancetool_spark.streaming.micro_batch import (
        iter_windows,
    )

    with pytest.raises(ValueError, match="width"):
        list(iter_windows(
            dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2), 0.0
        ))
    with pytest.raises(ValueError, match="overlap"):
        list(iter_windows(
            dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2),
            "10min", -1.0,
        ))


def test_stream_asof_rejects_zero_tolerance(spark):
    import pytest

    from qualityassurancetool_spark.streaming.stream_asof import (
        stream_asof_nearest,
    )

    dep = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="tolerance"):
        stream_asof_nearest(dep, dep, tolerance=0.0)


def test_session_gap_boundary_matches_batch(spark, tmp_path):
    """Events exactly `gap` apart: the batch twin splits only on
    STRICTLY greater, so they share one session — the streaming window
    is widened by 1 µs to agree (Spark's session_window alone splits
    at exactly gap; review finding, round 8)."""
    import datetime as dt

    from qualityassurancetool_spark.operators.sessionize import session_stats
    from qualityassurancetool_spark.streaming.micro_batch import (
        streaming_session_stats,
    )

    t0 = dt.datetime(2024, 5, 1)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(minutes=30)),  # EXACTLY the gap apart
        (3, 1, t0 + dt.timedelta(minutes=60, seconds=1)),  # > gap: splits
    ]
    schema = "event_id long, user_id long, ts timestamp"
    src = str(tmp_path / "sess_boundary_src")
    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = streaming_session_stats(stream, gap="30 minutes", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_boundary")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["n_events"]
        for r in spark.sql("SELECT * FROM sess_boundary").collect()
    )
    batch = sorted(
        r["n_events"]
        for r in session_stats(
            spark.createDataFrame(rows, schema),
            gap="30min",
            order_extra=["event_id"],
        ).collect()
    )
    assert got == batch == [1, 2]  # boundary pair merged in BOTH twins

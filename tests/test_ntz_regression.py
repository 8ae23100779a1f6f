"""Regression: µs-precision no-tz parquet must never kill a run again.

Round-1 postmortem: the driver's Spark 4 session read the testdata
``ts`` column (parquet ``timestamp[us]`` with no tz metadata) as
``TIMESTAMP_NTZ``, and ``unix_micros`` / ``withWatermark`` both reject
NTZ — one type-drift killed 16 oracle queries, 11 tests, and the bench.
These tests round-trip an NTZ-typed frame through ``load_table``, a
window-family operator, and a watermark so the class of bug stays dead.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qualityassurancetool_spark.functions.timeutils import (
    ensure_timestamp,
    epoch_micros,
)
from qualityassurancetool_spark.schema import load_table


def _ntz_events(spark, n=100):
    """In-memory events frame whose ts is TIMESTAMP_NTZ — the exact type
    the driver session surfaces for the testdata parquet."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = [
        (i, base + dt.timedelta(seconds=37 * i), i % 5, "click", float(i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema)


def test_epoch_micros_accepts_ntz(spark):
    df = _ntz_events(spark)
    got = (
        df.select(epoch_micros("ts").alias("us"))
        .agg(F.min("us").alias("lo"))
        .collect()[0]["lo"]
    )
    # 2024-01-01T00:00:00 UTC in epoch µs
    assert got == 1_704_067_200_000_000


def test_ensure_timestamp_casts_only_ntz(spark):
    df = _ntz_events(spark)
    fixed = ensure_timestamp(df, "ts")
    assert isinstance(fixed.schema["ts"].dataType, T.TimestampType)
    # idempotent: already-TIMESTAMP frames come back unchanged
    again = ensure_timestamp(fixed, "ts")
    assert isinstance(again.schema["ts"].dataType, T.TimestampType)
    # value-exact under the UTC session tz
    a = df.select(F.col("ts").cast("string").alias("s")).orderBy("s").collect()
    b = (
        fixed.select(F.col("ts").cast("string").alias("s"))
        .orderBy("s")
        .collect()
    )
    assert a == b


def test_load_table_never_returns_ntz_ts(spark, sf_dir, tmp_path):
    # the real driver tables, whatever type the session infers
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    # and a synthetic NTZ parquet written fresh (forces the NTZ branch even
    # if this session's parquet reader infers differently from the driver's)
    p = str(tmp_path / "ntz_events.parquet")
    _ntz_events(spark).write.parquet(p, mode="overwrite")
    raw = spark.read.parquet(p)
    assert isinstance(raw.schema["ts"].dataType, T.TimestampNTZType)
    healed = load_table(spark, str(tmp_path), "ntz_events")
    assert isinstance(healed.schema["ts"].dataType, T.TimestampType)


def test_window_op_and_watermark_over_ntz(spark):
    df = _ntz_events(spark)
    # window-family op straight on the NTZ frame: epoch_micros self-heals
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy(epoch_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    out = df.select(F.avg("value").over(w).alias("m")).agg(
        F.count("m")
    ).collect()
    assert out[0][0] == 100
    # watermark path: ensure_timestamp then withWatermark must not raise
    wm = ensure_timestamp(df, "ts").withWatermark("ts", "10 minutes")
    assert wm.count() == 100


def test_streaming_surfaces_accept_ntz(spark, tmp_path):
    from qualityassurancetool_spark.streaming.micro_batch import (
        tumbling_flag_rollup,
    )

    p = str(tmp_path / "stream_src")
    src = _ntz_events(spark).withColumn(
        "qc_flag", F.lit(0).cast("tinyint")
    )
    src.write.parquet(p, mode="overwrite")
    stream = spark.readStream.schema(
        spark.read.parquet(p).schema
    ).parquet(p)
    rolled = tumbling_flag_rollup(
        stream, ts_col="ts", flag_col="qc_flag"
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName("ntz_rollup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; the point is it RAN
    assert spark.table("ntz_rollup").columns == ["start", "end", "flag", "n"]

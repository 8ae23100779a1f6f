"""Streaming HyperLogLog (streaming/hll): register-exact parity with
the batch build, fixed state envelope, checkpoint-restart
continuation."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.hll import (
    hll_estimate,
    hll_registers,
)
from qualityassurancetool_spark.streaming.hll import streaming_hll

P = 8  # 256 registers — small enough to eyeball the state envelope


def _write_keys(spark, path, n, prefix, mode="overwrite"):
    (
        spark.range(n)
        .select(F.concat(F.lit(prefix), F.col("id")).alias("k"))
        .repartition(4)
        .write.mode(mode)
        .parquet(path)
    )


def _run(spark, land, ckpt, latest=None):
    # ``latest`` is the upsert sink table: update mode re-emits only
    # buckets the batch touched, so the sink persists across restarts
    # (exactly how a real upsert store behaves).
    stream = spark.readStream.schema("k string").parquet(land)
    latest = {} if latest is None else latest

    def sink(batch_df, _batch_id):
        for r in batch_df.collect():
            latest[r["bucket"]] = r["r"]

    q = (
        streaming_hll(stream, "k", p=P)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return latest


def test_register_exact_parity_and_restart(spark, tmp_path):
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    _write_keys(spark, land, 400, "a")
    got1 = _run(spark, land, ckpt)
    batch1 = {
        r["bucket"]: r["r"]
        for r in hll_registers(
            spark.read.parquet(land), "k", p=P
        ).collect()
    }
    assert got1 == batch1  # register-exact vs the batch operator

    # restart over NEW files: registers continue from checkpoint state
    _write_keys(spark, land, 300, "b", mode="append")
    got2 = _run(spark, land, ckpt, latest=dict(got1))
    batch_all = {
        r["bucket"]: r["r"]
        for r in hll_registers(
            spark.read.parquet(land), "k", p=P
        ).collect()
    }
    assert got2 == batch_all
    assert len(got2) <= 1 << P  # fixed state envelope

    # and the streamed registers are readable by the batch estimator
    sketch = spark.createDataFrame(
        [(b, r) for b, r in got2.items()], ["bucket", "r"]
    )
    est = hll_estimate(sketch, p=P).collect()[0]
    true = spark.read.parquet(land).select("k").distinct().count()
    assert abs(est.est_distinct - true) / true < 0.3  # p=8 → ~6.5% σ


def test_validation(spark, tmp_path):
    stream = spark.readStream.schema("k string").parquet(str(tmp_path))
    with pytest.raises(ValueError):
        streaming_hll(stream, "k", p=3)

"""Streaming KMV (streaming/kmv): hash-set-exact parity with the
batch sketch, bounded state envelope, checkpoint-restart
continuation, estimator compatibility."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.kmv import (
    kmv_estimate,
    kmv_sketch,
)
from qualityassurancetool_spark.streaming.kmv import (
    read_streamed_kmv,
    streaming_kmv,
)

K, SHARDS = 64, 4


def _write(spark, path, lo, hi, prefix, mode):
    (
        spark.range(lo, hi)
        .select(F.concat(F.lit(prefix), F.col("id")).alias("k"))
        .repartition(4)
        .write.mode(mode)
        .parquet(path)
    )


def _run(spark, land, ckpt, latest):
    stream = spark.readStream.schema("k string").parquet(land)

    def sink(batch_df, _bid):
        # upsert per (shard, pos); a shrunk shard can't happen (the
        # bottom-k only ever tightens), so (shard, pos) overwrite is
        # a faithful upsert store
        for r in batch_df.collect():
            latest[(r["shard"], r["pos"])] = r["h"]

    q = (
        streaming_kmv(stream, "k", k=K, shards=SHARDS)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return latest


def test_hash_set_exact_parity_and_restart(spark, tmp_path):
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    _write(spark, land, 0, 500, "a", "overwrite")
    got = _run(spark, land, ckpt, {})
    _write(spark, land, 500, 900, "b", "append")
    got = _run(spark, land, ckpt, got)
    assert len(got) <= SHARDS * K  # state envelope

    sink_df = spark.createDataFrame(
        [(s, p, h) for (s, p), h in got.items()], ["shard", "pos", "h"]
    )
    streamed = sorted(
        r.h for r in read_streamed_kmv(sink_df, k=K).collect()
    )
    batch = sorted(
        r.h
        for r in kmv_sketch(spark.read.parquet(land), "k", k=K).collect()
    )
    assert streamed == batch  # hash-set exact vs the batch operator

    est = kmv_estimate(
        read_streamed_kmv(sink_df, k=K), k=K
    ).collect()[0]
    assert abs(est.est_distinct - 900) / 900 < 0.6  # k=64 coarse


def test_validation(spark, tmp_path):
    stream = spark.readStream.schema("k string").parquet(str(tmp_path))
    with pytest.raises(ValueError):
        streaming_kmv(stream, "k", k=1)
    with pytest.raises(ValueError):
        streaming_kmv(stream, "k", shards=0)

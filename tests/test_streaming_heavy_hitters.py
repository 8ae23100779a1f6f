"""Bounded-state streaming heavy hitters (streaming/heavy_hitters)."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.streaming.heavy_hitters import (
    streaming_heavy_hitter_summaries,
)


def _write_keys(spark, path, pairs, mode="overwrite"):
    rows = [(k,) for k, c in pairs for _ in range(c)]
    spark.createDataFrame(rows, ["k"]).repartition(4).write.mode(
        mode
    ).parquet(path)


def _run(spark, land, ckpt, capacity=64, n_shards=4):
    schema = "k string"
    stream = spark.readStream.schema(schema).parquet(land)
    latest: dict = {}

    def sink(batch_df, _batch_id):
        for r in batch_df.collect():
            latest[r["key"]] = r["count_lb"]

    q = (
        streaming_heavy_hitter_summaries(
            stream, "k", capacity=capacity, n_shards=n_shards
        )
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return latest


def test_exact_counts_under_capacity_and_state_survives_restart(
    spark, tmp_path
):
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    _write_keys(spark, land, [("hot", 50), ("warm", 20), ("x", 3)])
    got1 = _run(spark, land, ckpt)
    # few distinct keys << capacity: MG is exact
    assert got1 == {"hot": 50, "warm": 20, "x": 3}

    # second availableNow run over NEW files continues the counts
    _write_keys(spark, land, [("hot", 25), ("y", 2)], mode="append")
    got2 = _run(spark, land, ckpt)
    assert got2["hot"] == 75
    assert got2["y"] == 2


def test_bounded_state_keeps_heavy_key(spark, tmp_path):
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    pairs = [("dominant", 500)] + [(f"noise{i}", 1) for i in range(400)]
    _write_keys(spark, land, pairs)
    got = _run(spark, land, ckpt, capacity=16, n_shards=2)
    # far more distinct keys than capacity x shards: summary stays
    # bounded yet the heavy key survives with a usable lower bound
    assert len(got) <= 16 * 2
    assert "dominant" in got
    assert got["dominant"] >= 500 - (900 // (16 + 1)) - 1


def test_matches_batch_candidates_superset(spark, tmp_path):
    from qualityassurancetool_spark.operators.heavy_hitters import (
        heavy_hitters,
    )

    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    pairs = [("a", 120), ("b", 60)] + [(f"z{i}", 2) for i in range(60)]
    _write_keys(spark, land, pairs)
    got = _run(spark, land, ckpt, capacity=30, n_shards=2)
    exact = {
        r["k"]: r["n"]
        for r in heavy_hitters(
            spark.read.parquet(land), "k", min_fraction=0.1
        ).collect()
    }
    # every true heavy hitter is present in the streaming candidates
    assert set(exact) <= set(got)


def test_validation(spark, tmp_path):
    stream = spark.readStream.schema("k string").parquet(str(tmp_path))
    with pytest.raises(ValueError):
        streaming_heavy_hitter_summaries(stream, "k", capacity=0)
    with pytest.raises(ValueError):
        streaming_heavy_hitter_summaries(stream, "k", n_shards=0)

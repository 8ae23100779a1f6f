"""Streaming Count-Min sketch (streaming/cms): cell-exact parity with
the batch build, fixed state, checkpoint-restart continuation."""

import pytest

from qualityassurancetool_spark.operators.cms import (
    cms_build,
    cms_query,
)
from qualityassurancetool_spark.streaming.cms import streaming_cms

W, D = 64, 3


def _write_keys(spark, path, pairs, mode="overwrite"):
    rows = [(k,) for k, c in pairs for _ in range(c)]
    spark.createDataFrame(rows, ["k"]).repartition(4).write.mode(
        mode
    ).parquet(path)


def _run(spark, land, ckpt):
    stream = spark.readStream.schema("k string").parquet(land)
    latest: dict = {}

    def sink(batch_df, _batch_id):
        for r in batch_df.collect():
            latest[(r["row"], r["col"])] = r["n"]

    q = (
        streaming_cms(stream, "k", width=W, depth=D)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return latest


def test_cell_exact_parity_and_restart(spark, tmp_path):
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    pairs1 = [("hot", 40), ("warm", 12), ("x", 3)]
    _write_keys(spark, land, pairs1)
    got1 = _run(spark, land, ckpt)
    batch1 = {
        (r["row"], r["col"]): r["n"]
        for r in cms_build(
            spark.createDataFrame(
                [(k,) for k, c in pairs1 for _ in range(c)], ["k"]
            ),
            "k",
            width=W,
            depth=D,
        ).collect()
    }
    assert got1 == batch1  # cell-exact vs the batch operator

    # restart over NEW files: the sketch continues from checkpoint state
    pairs2 = [("hot", 10), ("y", 5)]
    _write_keys(spark, land, pairs2, mode="append")
    got2 = _run(spark, land, ckpt)
    all_rows = [
        (k,) for k, c in pairs1 + pairs2 for _ in range(c)
    ]
    batch_all = {
        (r["row"], r["col"]): r["n"]
        for r in cms_build(
            spark.createDataFrame(all_rows, ["k"]), "k", width=W, depth=D
        ).collect()
    }
    assert got2 == batch_all
    assert len(got2) <= W * D  # fixed state envelope

    # and the streamed sketch is queryable by the batch query path
    sketch = spark.createDataFrame(
        [(r, c, n) for (r, c), n in got2.items()], ["row", "col", "n"]
    )
    est = {
        r["k"]: r["est"]
        for r in cms_query(
            sketch,
            spark.createDataFrame([("hot",), ("y",), ("absent",)], ["k"]),
            "k",
            width=W,
            depth=D,
        ).collect()
    }
    assert est["hot"] >= 50 and est["y"] >= 5 and est["absent"] >= 0


def test_validation(spark, tmp_path):
    stream = spark.readStream.schema("k string").parquet(str(tmp_path))
    with pytest.raises(ValueError):
        streaming_cms(stream, "k", width=0)

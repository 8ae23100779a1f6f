"""DDSketch (operators/ddsketch + streaming/ddsketch): the relative-
error guarantee against exact quantiles, merge algebra, three-store
(neg/zero/pos) semantics, grouped quantiles, streaming cell parity."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.ddsketch import (
    ddsketch_build,
    ddsketch_merge,
    ddsketch_quantiles,
)

ALPHA = 0.01
PROBS = [0.01, 0.25, 0.5, 0.75, 0.99]


def _vals(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], ["v"])


def _exact_quantile(vals, q):
    import math

    s = sorted(vals)
    # the walk picks the first cell with cum > q*(n-1): the 1-based
    # floor(q*(n-1))+1 item, i.e. the 0-based floor(q*(n-1)) item
    return s[math.floor(q * (len(s) - 1))]


def test_relative_error_guarantee(spark):
    import random

    rng = random.Random(7)
    vals = [rng.lognormvariate(3, 2) for _ in range(5000)]
    sk = ddsketch_build(_vals(spark, vals), "v", alpha=ALPHA)
    got = {
        r.prob: r.est
        for r in ddsketch_quantiles(sk, PROBS, alpha=ALPHA).collect()
    }
    for q in PROBS:
        true = _exact_quantile(vals, q)
        assert abs(got[q] - true) <= ALPHA * abs(true) + 1e-12, (
            q,
            got[q],
            true,
        )


def test_negative_and_zero_stores(spark):
    vals = [-100.0, -1.0, 0.0, 0.0, 1.0, 100.0]
    sk = ddsketch_build(_vals(spark, vals), "v", alpha=ALPHA)
    rows = {(r.sign, r.bucket): r.n for r in sk.collect()}
    assert rows[(0, 0)] == 2  # the two zeros share the zero store
    assert sum(n for (s, _), n in rows.items() if s == -1) == 2
    assert sum(n for (s, _), n in rows.items() if s == 1) == 2
    got = {
        r.prob: r.est
        for r in ddsketch_quantiles(
            sk, [0.0, 0.5, 1.0], alpha=ALPHA
        ).collect()
    }
    assert got[0.0] == pytest.approx(-100.0, rel=ALPHA)
    assert got[0.5] == 0.0  # rank 3.5 -> lower item = third = a zero
    assert got[1.0] == pytest.approx(100.0, rel=ALPHA)


def test_merge_cell_exact(spark):
    a = _vals(spark, [1, 2, 3, 1000])
    b = _vals(spark, [3, 4, 5])
    merged = ddsketch_merge(
        ddsketch_build(a, "v", alpha=ALPHA),
        ddsketch_build(b, "v", alpha=ALPHA),
    )
    direct = ddsketch_build(
        a.unionByName(b), "v", alpha=ALPHA
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_grouped_quantiles(spark):
    df = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        # group 0: values 1..1000; group 1: values 10x that
        ((F.col("id") / 2 + 1) * F.when(F.col("id") % 2 == 0, 1.0)
         .otherwise(10.0)).alias("v"),
    )
    sk = ddsketch_build(df, "v", group_cols=["g"], alpha=ALPHA)
    got = {
        (r.g, r.prob): r.est
        for r in ddsketch_quantiles(
            sk, [0.5], group_cols=["g"], alpha=ALPHA
        ).collect()
    }
    assert got[("0", 0.5)] == pytest.approx(500, rel=3 * ALPHA)
    assert got[("1", 0.5)] == pytest.approx(5000, rel=3 * ALPHA)


def test_bounded_cells(spark):
    # a 1e-3..1e9 spread at alpha=1% stays under ~1.4k cells
    df = spark.range(100_000).select(
        (F.pow(F.lit(10.0), (F.col("id") % 12) - 3)
         * (1 + (F.col("id") % 97) / 97.0)).alias("v")
    )
    n_cells = ddsketch_build(df, "v", alpha=ALPHA).count()
    assert n_cells < 1500


def test_validation(spark):
    df = _vals(spark, [1.0])
    with pytest.raises(ValueError):
        ddsketch_build(df, "v", alpha=1.5)
    sk = ddsketch_build(df, "v", alpha=ALPHA)
    with pytest.raises(ValueError):
        ddsketch_quantiles(sk, [], alpha=ALPHA)
    with pytest.raises(ValueError):
        ddsketch_quantiles(sk, [1.5], alpha=ALPHA)
    with pytest.raises(ValueError):
        ddsketch_merge()


def test_streaming_cell_exact_and_restart(spark, tmp_path):
    from qualityassurancetool_spark.streaming.ddsketch import (
        streaming_ddsketch,
    )

    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")

    def write(lo, hi, mode):
        (
            spark.range(lo, hi)
            .select(((F.col("id") % 500) - 100.0).alias("v"))
            .repartition(4)
            .write.mode(mode)
            .parquet(land)
        )

    def run(latest):
        stream = spark.readStream.schema("v double").parquet(land)

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                latest[(r["sign"], r["bucket"])] = r["n"]

        q = (
            streaming_ddsketch(stream, "v", alpha=ALPHA)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return latest

    write(0, 2000, "overwrite")
    got = run({})
    write(2000, 3000, "append")
    got = run(got)
    batch = {
        (r.sign, r.bucket): r.n
        for r in ddsketch_build(
            spark.read.parquet(land), "v", alpha=ALPHA
        ).collect()
    }
    assert got == batch  # cell-exact vs the batch operator
    # and the streamed cells feed the batch quantile walk directly
    sk = spark.createDataFrame(
        [(s, b, n) for (s, b), n in got.items()],
        ["sign", "bucket", "n"],
    )
    est = {
        r.prob: r.est
        for r in ddsketch_quantiles(sk, [0.5], alpha=ALPHA).collect()
    }
    vals = [(i % 500) - 100.0 for i in range(3000)]
    true = _exact_quantile(vals, 0.5)
    assert abs(est[0.5] - true) <= ALPHA * abs(true) + 1e-12

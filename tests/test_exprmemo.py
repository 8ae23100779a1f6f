"""functions/exprmemo: Column-tree memoization reuse, key sensitivity,
and stale-SparkContext refresh (round-11 optimization net)."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions import exprmemo
from qualityassurancetool_spark.functions.exprmemo import memoized_expr


def test_same_key_returns_same_object(spark):
    calls = []

    def build():
        calls.append(1)
        return F.col("x") + 1

    a = memoized_expr(("t1", "x"), build)
    b = memoized_expr(("t1", "x"), build)
    assert a is b
    assert len(calls) == 1


def test_different_key_rebuilds(spark):
    a = memoized_expr(("t2", "x"), lambda: F.col("x") + 1)
    b = memoized_expr(("t2", "y"), lambda: F.col("y") + 1)
    assert a is not b


def test_memoized_column_usable_in_many_plans(spark):
    c = memoized_expr(("t3",), lambda: F.col("v") * 2)
    df1 = spark.createDataFrame([(1,)], ["v"]).select(c.alias("o"))
    df2 = spark.createDataFrame([(5,)], ["v"]).select(c.alias("o"))
    assert df1.collect()[0][0] == 2
    assert df2.collect()[0][0] == 10


def test_stale_context_refreshes(spark):
    built = []

    def build():
        built.append(1)
        return F.lit(1)

    memoized_expr(("t4",), build)
    # simulate a stopped-and-recreated session: poison the cached
    # context identity; next call must rebuild instead of serving the
    # dead session's handle
    key = ("t4",)
    col = exprmemo._MEMO[key][1]
    exprmemo._MEMO[key] = (object(), col)
    memoized_expr(key, build)
    assert len(built) == 2


def test_ewma_expressions_identical_after_memo_hit(spark):
    # two builds of the same ewma chart share the memoized tree and
    # produce identical results (the operator-level consumer)
    from qualityassurancetool_spark.operators.ewma import ewma_anomaly

    rows = [(i, "s", float(v)) for i, v in enumerate([1, 1, 1, 1, 9, 1])]
    df = spark.createDataFrame(rows, ["t", "g", "v"])
    a = ewma_anomaly(df, "v", ["t"], ["g"], window=4).collect()
    b = ewma_anomaly(df, "v", ["t"], ["g"], window=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a different window must NOT serve the memoized 4-lag tree
    c = ewma_anomaly(df, "v", ["t"], ["g"], window=2).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_column_key_distinguishes_bound_columns(spark):
    # round-11 advisor: Column.__repr__ pretty-prints WITHOUT exprIds,
    # so df1["embedding"] and df2["embedding"] render identically while
    # wrapping different resolved attributes.  column_key must key them
    # apart (and keep unresolved F.col callers cache-stable).
    from qualityassurancetool_spark.functions.exprmemo import column_key

    df1 = spark.range(3).select(F.col("id").alias("embedding"))
    df2 = spark.range(4).select(F.col("id").alias("embedding"))
    assert str(df1["embedding"]) == str(df2["embedding"])  # the trap
    assert column_key(df1["embedding"]) != column_key(df2["embedding"])
    assert column_key(F.col("embedding")) == column_key(F.col("embedding"))
    assert column_key(F.col("embedding")) != column_key(df1["embedding"])


def test_nearest_centroids_bound_column_resolves(spark):
    # public-API consumer of the key fix: the same centroid set asked
    # through two different DataFrames' bound columns must resolve
    # against each frame (a shared memo entry would raise
    # "resolved attribute missing" on the second frame)
    from qualityassurancetool_spark.operators.similarity import (
        nearest_centroids,
    )

    cents = ([0, 1], [[0.0, 0.0], [10.0, 10.0]])
    df1 = spark.createDataFrame(
        [([0.1, 0.2],)], ["embedding"]
    )
    df2 = spark.createDataFrame(
        [([9.0, 9.5],), ([0.4, 0.1],)], ["embedding"]
    )
    a = df1.select(
        nearest_centroids(df1["embedding"], cents[0], cents[1], 1)
        .alias("c")
    ).collect()
    b = df2.select(
        nearest_centroids(df2["embedding"], cents[0], cents[1], 1)
        .alias("c")
    ).collect()
    assert [r["c"] for r in a] == [[0]]
    assert sorted(r["c"][0] for r in b) == [0, 1]

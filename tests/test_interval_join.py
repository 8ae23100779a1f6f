"""Bucketed point-in-interval lookup (operators/interval_join).
Cross-engine parity: tools/extra_oracles.py::x_interval_join."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.interval_join import (
    interval_lookup,
)


def _pts(spark, xs):
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], ["pid", "x"]
    )


def _ivs(spark, triples):
    return spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(triples)],
        ["iid", "lo", "hi"],
    )


def test_matches_equal_naive_between(spark):
    import random

    rng = random.Random(7)
    xs = [rng.uniform(0, 100) for _ in range(300)]
    ivs = [
        (a, a + rng.uniform(0, 12))
        for a in (rng.uniform(0, 100) for _ in range(40))
    ]
    pts, iv = _pts(spark, xs), _ivs(spark, ivs)
    got = {
        (r["pid"], r["iid"])
        for r in interval_lookup(pts, iv, "x", bucket_width=5.0).collect()
    }
    naive = {
        (pid, iid)
        for pid, x in enumerate(xs)
        for iid, (a, b) in enumerate(ivs)
        if a <= x <= b
    }
    assert got == naive


def test_inclusive_bounds_and_bucket_edges(spark):
    # points exactly on lo, hi, and on bucket boundaries must match
    pts = _pts(spark, [10.0, 20.0, 15.0, 9.999, 20.001])
    iv = _ivs(spark, [(10.0, 20.0)])
    got = {
        r["pid"]
        for r in interval_lookup(pts, iv, "x", bucket_width=10.0).collect()
    }
    assert got == {0, 1, 2}


def test_left_join_keeps_unmatched(spark):
    pts = _pts(spark, [1.0, 50.0])
    iv = _ivs(spark, [(0.0, 2.0)])
    rows = interval_lookup(
        pts, iv, "x", bucket_width=1.0, how="left"
    ).collect()
    by_pid = {r["pid"]: r["iid"] for r in rows}
    assert by_pid == {0: 0, 1: None}
    assert len(rows) == 2


def test_degenerate_and_null_intervals_dropped(spark):
    pts = _pts(spark, [5.0])
    iv = spark.createDataFrame(
        [(0, 10.0, 2.0), (1, None, 8.0), (2, 4.0, None), (3, 4.0, 6.0)],
        ["iid", "lo", "hi"],
    )
    got = [
        r["iid"] for r in interval_lookup(pts, iv, "x", bucket_width=2.0).collect()
    ]
    assert got == [3]


def test_wide_interval_guard_raises(spark):
    pts = _pts(spark, [5.0])
    iv = _ivs(spark, [(0.0, 1e9)])
    with pytest.raises(Exception, match="spans more than"):
        interval_lookup(
            pts, iv, "x", bucket_width=1.0, max_span_buckets=100
        ).collect()


def test_validation(spark):
    pts = _pts(spark, [1.0])
    iv = _ivs(spark, [(0.0, 2.0)])
    with pytest.raises(ValueError, match="how"):
        interval_lookup(pts, iv, "x", how="outer")
    with pytest.raises(ValueError, match="bucket_width"):
        interval_lookup(pts, iv, "x", bucket_width=0.0)
    with pytest.raises(ValueError, match="overlapping column"):
        interval_lookup(
            pts.withColumnRenamed("pid", "iid"), iv, "x"
        )


def test_plan_is_hash_join_not_nested_loop(spark):
    pts = _pts(spark, [1.0] * 10)
    iv = _ivs(spark, [(0.0, 2.0)] * 5)
    explained = (
        interval_lookup(pts, iv, "x", bucket_width=1.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in explained and "Cartesian" not in explained

"""HyperLogLog sketch (operators/hll): register-table semantics, the
merge property, estimate accuracy vs the published 1.04/√m bound, and
null/edge handling."""

import math

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.hll import (
    hll_distinct_by,
    hll_error_bound,
    hll_estimate,
    hll_merge,
    hll_registers,
)

P = 12


def _keys(spark, n, prefix="k", part=8):
    return (
        spark.range(n)
        .select(F.concat(F.lit(prefix), F.col("id")).alias("k"))
        .repartition(part)
    )


def test_estimate_within_published_bound(spark):
    # 1.04/sqrt(4096) ~ 1.6% standard error; allow 4 sigma.
    for n in (100, 1000, 20000):
        est = hll_estimate(
            hll_registers(_keys(spark, n), "k", p=P), p=P
        ).collect()[0]
        rel = abs(est.est_distinct - n) / n
        assert rel < 4 * hll_error_bound(P), (n, est.est_distinct)


def test_duplicates_do_not_move_the_estimate(spark):
    base = _keys(spark, 500)
    dup = base.unionByName(base).unionByName(base)
    a = hll_estimate(hll_registers(base, "k", p=P), p=P).collect()[0]
    b = hll_estimate(hll_registers(dup, "k", p=P), p=P).collect()[0]
    assert a.asDict() == b.asDict()


def test_merge_equals_whole_and_is_idempotent(spark):
    whole = _keys(spark, 3000)
    a = whole.where(F.substring("k", 2, 10).cast("long") % 3 == 0)
    b = whole.where(F.substring("k", 2, 10).cast("long") % 3 != 0)
    ra, rb = (hll_registers(d, "k", p=P) for d in (a, b))
    merged = hll_estimate(hll_merge(ra, rb), p=P).collect()[0]
    direct = hll_estimate(hll_registers(whole, "k", p=P), p=P).collect()[0]
    assert merged.asDict() == direct.asDict()
    # idempotent: merging a sketch with itself changes nothing
    again = hll_estimate(hll_merge(ra, ra), p=P).collect()[0]
    solo = hll_estimate(ra, p=P).collect()[0]
    assert again.asDict() == solo.asDict()


def test_register_table_shape_and_bounds(spark):
    regs = hll_registers(_keys(spark, 50000), "k", p=8).collect()
    assert len(regs) <= 256
    assert all(1 <= r.r <= 49 for r in regs)
    assert len({r.bucket for r in regs}) == len(regs)


def test_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [(None,), ("a",), ("b",), (None,)], ["k"]
    )
    est = hll_estimate(hll_registers(df, "k", p=P), p=P).collect()[0]
    assert est.n_registers == 2  # nulls dropped; tiny → linear counting
    assert est.est_distinct == pytest.approx(2.0, rel=0.01)
    empty = df.where(F.col("k").isNull()).where(F.col("k").isNotNull())
    e = hll_estimate(hll_registers(empty, "k", p=P), p=P).collect()[0]
    assert e.n_registers == 0 and e.est_distinct == 0.0


def test_grouped_matches_per_group_plain(spark):
    df = (
        spark.range(4000)
        .select(
            (F.col("id") % 7).cast("string").alias("g"),
            F.concat(F.lit("v"), (F.col("id") % 900)).alias("k"),
        )
        .repartition(8)
    )
    grouped = {
        r.g: r
        for r in hll_distinct_by(df, ["g"], "k", p=10).collect()
    }
    for g in [str(i) for i in range(7)]:
        solo = hll_estimate(
            hll_registers(df.where(F.col("g") == g), "k", p=10), p=10
        ).collect()[0]
        got = grouped[g]
        assert (got.n_registers, got.max_r, got.sum_pow) == (
            solo.n_registers,
            solo.max_r,
            solo.sum_pow,
        )
        assert got.est_distinct == solo.est_distinct


def test_estimate_is_exact_integer_core(spark):
    # sum_pow is a long (exact), never a rounded double
    est = hll_estimate(
        hll_registers(_keys(spark, 1000), "k", p=P), p=P
    )
    dtypes = dict(est.dtypes)
    assert dtypes["sum_pow"] == "bigint"
    assert dtypes["n_registers"] == "bigint"


def test_p_validation(spark):
    df = _keys(spark, 10)
    for bad in (3, 13, 0):
        with pytest.raises(ValueError):
            hll_registers(df, "k", p=bad)
    with pytest.raises(ValueError):
        hll_merge()


def test_error_bound_value():
    assert hll_error_bound(12) == pytest.approx(1.04 / math.sqrt(4096))

"""Equal-frequency binning: hand-computed cuts, group independence,
null/skew discipline, approx-mode agreement."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.feature_prep import (
    quantile_bin,
)


def test_hand_computed_quartiles(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 9)], ["x"]
    )
    out = quantile_bin(df, "x", 4).orderBy("x").collect()
    # cuts (type-7 on 1..8): q25=2.75, q50=4.5, q75=6.25
    assert [r["x_bin"] for r in out] == [0, 0, 1, 1, 2, 2, 3, 3]


def test_balanced_bin_sizes(spark):
    df = spark.range(1000).select(
        (F.col("id").cast("double")).alias("x")
    )
    counts = {
        r["x_bin"]: r["c"]
        for r in quantile_bin(df, "x", 5)
        .groupBy("x_bin")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert set(counts) == {0, 1, 2, 3, 4}
    assert all(190 <= c <= 210 for c in counts.values())


def test_grouped_bins_independent(spark):
    # group a: 1..4, group b: 101..104 — same bins per group
    rows = [("a", float(v)) for v in range(1, 5)] + [
        ("b", float(v)) for v in range(101, 105)
    ]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = quantile_bin(df, "x", 2, group_cols=["g"]).collect()
    for r in out:
        expected = 0 if (r["x"] % 100) <= 2 else 1
        assert r["x_bin"] == expected, r


def test_null_values_get_null_bin(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (4.0,)], "x double"
    )
    out = {r["x"]: r["x_bin"] for r in quantile_bin(df, "x", 2).collect()}
    assert out[None] is None
    assert out[1.0] == 0 and out[4.0] == 1


def test_constant_column_single_bin(spark):
    df = spark.createDataFrame([(7.0,)] * 10, "x double")
    out = quantile_bin(df, "x", 4).collect()
    assert {r["x_bin"] for r in out} == {0}


def test_approx_mode_close_to_exact(spark):
    df = spark.range(5000).select(
        ((F.col("id") * 37) % 997).cast("double").alias("x")
    )
    exact = quantile_bin(df, "x", 4, out_col="b")
    approx = quantile_bin(df, "x", 4, out_col="b", approx=True)
    both = exact.alias("e").join(
        approx.alias("a"), on="x"
    )
    frac_same = (
        both.select(
            F.avg(
                (F.col("e.b") == F.col("a.b")).cast("double")
            ).alias("s")
        ).collect()[0]["s"]
    )
    assert frac_same > 0.99


def test_validation(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        quantile_bin(df, "x", 1)


def test_null_group_stratum_gets_bins(spark):
    """NULL group keys form their own stratum (null-safe join) —
    non-null values in the NULL group must receive real bins, the
    same discipline as target_encode/heavy_hitters."""
    from pyspark.sql import functions as F

    from qualityassurancetool_spark.operators.feature_prep import (
        quantile_bin,
    )

    rows = [("a", float(i)) for i in range(8)] + [
        (None, float(i)) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    out = quantile_bin(df, "x", 2, group_cols=["g"], out_col="b")
    null_grp = out.where(F.col("g").isNull()).collect()
    assert all(r["b"] is not None for r in null_grp)
    assert {r["b"] for r in null_grp} == {0, 1}

"""ANALYZE-style table profile (operators/table_stats): exact stats
correct, sketched stats within guarantees, schema/validation."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.table_stats import table_profile


def _profile_dict(df, **kw):
    return {
        (r.column, r.stat): r.value
        for r in table_profile(df, **kw).collect()
    }


def test_exact_stats(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, None)],
        ["k", "v", "s"],
    )
    got = _profile_dict(df)
    assert got[("k", "count")] == 3.0
    assert got[("v", "count")] == 2.0
    assert got[("v", "null_count")] == 1.0
    assert got[("s", "null_count")] == 1.0
    assert got[("v", "min")] == 10.0
    assert got[("v", "max")] == 30.0
    assert got[("v", "mean")] == 20.0
    # non-numeric column has no min/max/mean/quantiles
    assert ("s", "min") not in got and ("s", "q0.5") not in got


def test_sketched_stats_within_guarantees(spark):
    df = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 100 + 1.0).alias("v")
    )
    got = _profile_dict(df, quantiles=(0.5,))
    assert got[("k", "ndv_est")] == pytest.approx(5000, rel=0.07)
    assert got[("v", "ndv_est")] == pytest.approx(100, rel=0.07)
    # median of 1..100 uniform within the 2% relative guarantee + grid
    assert got[("v", "q0.5")] == pytest.approx(50, rel=0.05)


def test_column_subset_and_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    got = _profile_dict(df, columns=["b"])
    assert {c for c, _ in got} == {"b"}
    with pytest.raises(ValueError, match="unknown columns"):
        table_profile(df, columns=["nope"])

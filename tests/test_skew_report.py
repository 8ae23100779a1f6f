"""Key-skew diagnostic (operators/skew.key_skew_report).
Cross-engine parity: tools/extra_oracles.py::x_skew_report."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.skew import key_skew_report


def test_report_values(spark):
    rows = [("hot",)] * 90 + [("a",)] * 5 + [("b",)] * 4 + [(None,)] * 7 + [
        ("c",)
    ]
    df = spark.createDataFrame(rows, ["k"])
    r = key_skew_report(df, "k").collect()[0]
    assert r["n_rows"] == 100          # nulls excluded
    assert r["n_keys"] == 4
    assert r["max_count"] == 90
    assert r["avg_count"] == pytest.approx(25.0)
    assert r["skew_ratio"] == pytest.approx(90 / 25.0)
    # exact interpolated percentiles over counts [1, 4, 5, 90]
    assert r["p50_count"] == pytest.approx(4.5)


def test_uniform_key_has_no_skew(spark):
    df = spark.createDataFrame([(i % 10,) for i in range(100)], ["k"])
    r = key_skew_report(df, "k").collect()[0]
    assert r["skew_ratio"] == pytest.approx(1.0)

"""Fixed-width histogram (plans/corpus_report.value_histogram).
Cross-engine parity: tools/extra_oracles.py::x_histogram."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.plans.corpus_report import value_histogram


def test_bins_clamp_and_nulls(spark):
    vals = [-5.0, 0.0, 9.99, 10.0, 55.0, 99.99, 100.0, 250.0, None]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {
        r["bin_id"]: (r["bin_lo"], r["bin_hi"], r["n"])
        for r in value_histogram(df, "v", 0.0, 100.0, n_bins=10).collect()
    }
    # -5 clamps to bin 0; 100 and 250 clamp to bin 9; null dropped
    assert got[0] == (0.0, 10.0, 3)     # -5, 0, 9.99
    assert got[1] == (10.0, 20.0, 1)    # 10.0
    assert got[5] == (50.0, 60.0, 1)
    assert got[9] == (90.0, 100.0, 3)   # 99.99, 100, 250
    assert sum(n for _, _, n in got.values()) == 8


def test_grouped_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.5), ("b", 1.0)], ["g", "v"]
    )
    rows = value_histogram(df, "v", 0.0, 2.0, n_bins=2, group_col="g").collect()
    got = {(r["g"], r["bin_id"]): r["n"] for r in rows}
    assert got == {("a", 1): 2, ("b", 1): 1}
    with pytest.raises(ValueError):
        value_histogram(df, "v", 2.0, 2.0)
    with pytest.raises(ValueError):
        value_histogram(df, "v", 0.0, 1.0, n_bins=0)

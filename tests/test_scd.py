"""SCD2 point-in-time lookup (operators/scd).
Cross-engine parity: tools/extra_oracles.py::x_scd2."""

import datetime

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.scd import (
    scd2_lookup,
    scd2_violations,
)


def _d(s):
    return datetime.date.fromisoformat(s)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, ["k", "valid_from", "valid_to", "attr"]
    )


GOOD_DIM = [
    (1, "2020-01-01", "2020-06-01", "a1"),
    (1, "2020-06-01", "2021-01-01", "a2"),
    (2, "2020-01-01", "9999-12-31", "b1"),
]


def test_lookup_picks_version_valid_at_ts(spark):
    dim = _dim(spark, [(k, _d(f), _d(t), a) for k, f, t, a in GOOD_DIM])
    facts = spark.createDataFrame(
        [
            (10, 1, _d("2020-03-15")),   # a1
            (11, 1, _d("2020-06-01")),   # boundary: half-open → a2
            (12, 1, _d("2021-01-01")),   # after last version → null
            (13, 2, _d("2025-05-05")),   # open-ended b1
            (14, 3, _d("2020-01-01")),   # unknown key → null
        ],
        ["fid", "k", "ts"],
    )
    got = {
        r["fid"]: r["attr"]
        for r in scd2_lookup(facts, dim, "k", "ts").collect()
    }
    assert got == {10: "a1", 11: "a2", 12: None, 13: "b1", 14: None}
    inner = scd2_lookup(facts, dim, "k", "ts", how="inner")
    assert {r["fid"] for r in inner.collect()} == {10, 11, 13}


def test_violations_classified(spark):
    dim = _dim(
        spark,
        [
            (1, _d("2020-01-01"), _d("2020-06-01"), "ok"),
            (1, _d("2020-05-01"), _d("2020-09-01"), "overlaps"),
            (2, _d("2020-03-01"), _d("2020-03-01"), "empty"),
            (3, None, _d("2020-03-01"), "nullb"),
        ],
    )
    got = {r["attr"]: r["violation"] for r in scd2_violations(dim, "k").collect()}
    assert got == {
        "overlaps": "overlap",
        "empty": "empty",
        "nullb": "null_bound",
    }
    good = _dim(spark, [(k, _d(f), _d(t), a) for k, f, t, a in GOOD_DIM])
    assert scd2_violations(good, "k").count() == 0


def test_validation(spark):
    dim = _dim(spark, [(1, _d("2020-01-01"), _d("2021-01-01"), "a")])
    facts = spark.createDataFrame([(1, 1, _d("2020-05-05"))], ["fid", "k", "ts"])
    with pytest.raises(ValueError, match="how"):
        scd2_lookup(facts, dim, "k", "ts", how="full")
    clash = facts.withColumnRenamed("fid", "attr")
    with pytest.raises(ValueError, match="overlapping non-key"):
        scd2_lookup(clash, dim, "k", "ts")


def test_contained_version_overlap_is_tagged(spark):
    """A short version strictly inside an earlier long one must itself
    be tagged 'overlap' (running max over all earlier versions, not
    just the immediate predecessor — review finding)."""
    dim = _dim(
        spark,
        [
            (1, _d("2020-01-01"), _d("2020-12-31"), "long"),
            (1, _d("2020-02-01"), _d("2020-02-02"), "containedA"),
            (1, _d("2020-05-01"), _d("2020-05-02"), "containedB"),
        ],
    )
    got = {
        r["attr"]: r["violation"] for r in scd2_violations(dim, "k").collect()
    }
    assert got == {"containedA": "overlap", "containedB": "overlap"}

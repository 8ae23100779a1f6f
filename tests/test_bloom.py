"""Bloom-filter membership (operators/bloom): no false negatives,
bounded false-positive rate, parameter formulas, prefilter recall.
Cross-engine bit-set parity: tools/extra_oracles.py::x_bloom."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.bloom import (
    MAX_BITS,
    bloom_parameters,
    bloom_prefilter,
    build_bloom,
    might_contain,
)


def _kv(spark, ids):
    return spark.createDataFrame([(i, f"key{i}") for i in ids], ["id", "v"])


def test_parameters_formula():
    m, k = bloom_parameters(1000, fpp=0.01)
    assert m % 32 == 0
    # textbook optimum: ~9.59 bits/key, ~7 hashes at 1 % fpp
    assert 9 * 1000 <= m <= 11 * 1000
    assert 6 <= k <= 8
    with pytest.raises(ValueError):
        bloom_parameters(10, fpp=0.0)


def test_no_false_negatives(spark):
    keys = _kv(spark, range(500))
    m, k = bloom_parameters(500, fpp=0.01)
    words = build_bloom(keys, "v", m, k)
    found = keys.where(might_contain(F.col("v"), words, k)).count()
    assert found == 500  # Bloom's hard guarantee


def test_false_positive_rate_bounded(spark):
    keys = _kv(spark, range(500))
    m, k = bloom_parameters(500, fpp=0.01)
    words = build_bloom(keys, "v", m, k)
    probe = _kv(spark, range(10_000, 15_000))  # disjoint
    fp = probe.where(might_contain(F.col("v"), words, k)).count()
    # 1 % target over 5000 probes → expect ~50; allow generous 4x
    assert fp <= 200, fp


def test_build_guards(spark):
    keys = _kv(spark, range(10))
    with pytest.raises(ValueError):
        build_bloom(keys, "v", MAX_BITS * 2, 3)
    with pytest.raises(ValueError):
        build_bloom(keys, "v", 100, 3)  # not word-aligned


def test_prefilter_superset_of_exact(spark):
    probe = _kv(spark, range(2000))
    keys = _kv(spark, range(0, 2000, 7)).select("v")
    got = bloom_prefilter(probe, keys, "v", fpp=0.01)
    exact = probe.join(keys, "v", "leftsemi")
    # every exact match survives the screen (no false negatives) …
    assert got.join(exact, "id", "leftsemi").count() == exact.count()
    # … and the screen is close to exact (few false positives)
    assert got.count() <= exact.count() + 60

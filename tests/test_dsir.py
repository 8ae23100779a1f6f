"""DSIR importance resampling (operators/dsir): determinism, shift
toward the target distribution, zero-feature docs, bucket-cap guard.
The full fit→score→select chain is cross-engine checked by
tools/extra_oracles.py::x_dsir."""

import math

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.dsir import (
    MAX_BUCKETS,
    doc_features,
    dsir_resample,
    fit_log_ratio,
    gumbel_key,
    importance_scores,
)
from qualityassurancetool_spark.schema import load_table

B = 512


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def log_ratio(docs):
    return fit_log_ratio(
        raw=docs, target=docs.where(F.col("lang") == "en"), n_buckets=B
    )


def test_fit_shape_and_finiteness(log_ratio):
    assert len(log_ratio) == B
    assert all(math.isfinite(v) for v in log_ratio)
    # smoothing guarantees no bucket is ±inf even if unseen on one side
    assert any(v != 0.0 for v in log_ratio)


def test_scores_shift_toward_target(docs, log_ratio):
    """Docs drawn from the target slice (en) must score higher on
    average than off-target docs — the operator's entire point."""
    scored = importance_scores(docs, log_ratio)
    rows = (
        scored.groupBy("lang")
        .agg(F.avg("dsir_score").alias("m"))
        .collect()
    )
    means = {r["lang"]: r["m"] for r in rows}
    en = means.pop("en")
    assert means, "testdata should contain non-en docs"
    assert all(en > m for m in means.values()), means


def test_zero_feature_doc_scores_zero(spark, log_ratio):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello world")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in importance_scores(df, log_ratio).collect()
    }
    assert rows[1]["n_features"] == 0 and rows[1]["dsir_score"] == 0.0
    assert rows[2]["n_features"] == 0 and rows[2]["dsir_score"] == 0.0
    # "hello world" → 2 unigrams + 1 bigram
    assert rows[3]["n_features"] == 3


def test_feature_multiplicity_kept(spark):
    """Bag semantics: repeated grams count every occurrence (the paper's
    hashed n-gram model is a bag, not a set)."""
    df = spark.createDataFrame([(1, "a a a")], ["doc_id", "text"])
    row = doc_features(df, 64).collect()[0]
    # 3 unigrams + 2 bigrams, duplicates preserved
    assert len(row["_fb"]) == 5


def test_resample_deterministic_and_ranked(docs, log_ratio):
    a = dsir_resample(docs, log_ratio, k=50)
    ids_a = [r["doc_id"] for r in a.select("doc_id").collect()]
    ids_b = [
        r["doc_id"]
        for r in dsir_resample(docs, log_ratio, k=50).select("doc_id").collect()
    ]
    assert ids_a == ids_b
    assert len(ids_a) == 50 and len(set(ids_a)) == 50
    keys = [r["dsir_key"] for r in a.select("dsir_key").collect()]
    assert keys == sorted(keys, reverse=True)
    assert all(math.isfinite(k) for k in keys)


def test_gumbel_key_salt_changes_sample(docs, log_ratio):
    a = {r["doc_id"] for r in dsir_resample(docs, log_ratio, 50).collect()}
    b = {
        r["doc_id"]
        for r in dsir_resample(docs, log_ratio, 50, salt="other:").collect()
    }
    assert a != b  # different noise realization → different draw


def test_gumbel_key_is_pure_column(spark):
    df = spark.createDataFrame([(7, 1.5)], ["doc_id", "s"])
    v = df.select(
        gumbel_key(F.col("s"), F.col("doc_id")).alias("k")
    ).collect()[0]["k"]
    assert math.isfinite(v)


def test_bucket_cap_guard(docs):
    with pytest.raises(ValueError):
        fit_log_ratio(docs, docs, n_buckets=MAX_BUCKETS + 1)


def test_fast_mode_same_structure(docs):
    """xxhash64 fast mode: same API, same shapes, different hash family
    — selection differs but the target-shift property must hold."""
    lr = fit_log_ratio(
        raw=docs,
        target=docs.where(F.col("lang") == "en"),
        n_buckets=B,
        hash_mode="fast",
    )
    assert len(lr) == B
    scored = importance_scores(docs, lr, hash_mode="fast")
    rows = scored.groupBy("lang").agg(F.avg("dsir_score").alias("m")).collect()
    means = {r["lang"]: r["m"] for r in rows}
    en = means.pop("en")
    assert all(en > m for m in means.values()), means


def test_hash_mode_guard(docs):
    import pytest as _pt

    with _pt.raises(ValueError):
        fit_log_ratio(docs, docs, n_buckets=64, hash_mode="nope")

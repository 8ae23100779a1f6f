"""Null/degenerate-input contracts pinned by the round-8 review of the
text-quality / decontamination / sampling / mixing family."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_analyze_null_text_scores_like_empty(spark):
    """Null text must not OUTSCORE empty text (least() skipped the null
    stopword term → sw_score 1.0) nor leak size(NULL) = -1 into
    n_tokens."""
    from qualityassurancetool_spark.operators.text import analyze

    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in analyze(df).collect()}
    assert out[1]["n_tokens"] == 0 and out[2]["n_tokens"] == 0
    assert out[1]["quality_score"] == out[2]["quality_score"]


def test_quality_signals_null_text_pii_is_zero(spark):
    from qualityassurancetool_spark.operators.quality_filters import (
        quality_signals,
    )

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = quality_signals(df).collect()[0]
    assert r["pii_emails"] == 0.0 and r["pii_ipv4"] == 0.0
    assert r["symbol_ratio"] == 0.0


def test_short_docs_have_no_kgrams_for_decontamination(spark):
    """Docs under k tokens must not read as contaminated on a phantom
    whole-doc gram (two empty docs used to flag at overlap_frac 1.0)."""
    from qualityassurancetool_spark.operators.decontam import (
        benchmark_ngram_overlap,
    )

    train = spark.createDataFrame(
        [(1, ""), (2, "tiny doc"), (3, None)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, ""), (101, "tiny doc")], "doc_id long, text string"
    )
    assert benchmark_ngram_overlap(train, bench, k=5).count() == 0


def test_semantic_decontaminate_gemm_handles_null_embedding(spark):
    """One null embedding must not abort the corpus scan: both
    strategies agree on null/null/False."""
    from qualityassurancetool_spark.operators.decontam import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    bench = [(9, [1.0, 0.0])]
    for strategy in ("column", "gemm"):
        rows = {
            r["vec_id"]: r
            for r in semantic_decontaminate(
                corpus, bench, threshold=0.9, strategy=strategy
            ).collect()
        }
        assert rows[1]["contaminated"] is True, strategy
        assert rows[2]["max_sim"] is None, strategy
        assert rows[2]["contaminated"] is False, strategy


def test_split_by_group_null_key_gets_null_split(spark):
    """Malformed rows must surface, not silently land in the eval
    split (the WHEN chain's fall-through default)."""
    from qualityassurancetool_spark.operators.sampling import split_by_group

    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "doc_id long, domain string"
    )
    out = {
        r["doc_id"]: r["split"]
        for r in split_by_group(
            df, {"train": 0.8, "test": 0.2}, "domain"
        ).collect()
    }
    assert out[2] is None and out[1] in ("train", "test")


def test_mixture_excludes_null_ids_consistently(spark):
    """Membership must be continuous in the weight: null-id rows are
    excluded from full AND fractional epochs (full epochs used to keep
    them, so weight 1.0 → 0.999 dropped them discontinuously)."""
    from qualityassurancetool_spark.operators.mixing import mix_corpora

    src = spark.createDataFrame(
        [(1, "a"), (None, "b")], "doc_id long, text string"
    )
    full = mix_corpora({"s": src}, {"s": 1.0}).count()
    frac = mix_corpora({"s": src}, {"s": 0.999}).count()
    assert full == 1 and frac <= 1


def test_deterministic_shuffle_is_stable_under_rerun(spark):
    from qualityassurancetool_spark.operators.sampling import (
        deterministic_shuffle,
    )

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = [r["doc_id"] for r in deterministic_shuffle(df).collect()]
    b = [r["doc_id"] for r in deterministic_shuffle(df).collect()]
    assert a == b and a != sorted(a)

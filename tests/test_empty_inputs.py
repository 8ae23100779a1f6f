"""Empty-input hardening: every operator family must return an empty
(correctly-schema'd) result on zero rows, not crash — at 100 TB some
partition, stream, or time window is always empty."""

from __future__ import annotations

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.asof import asof_nearest_join
from qualityassurancetool_spark.operators.dedup import exact_dedup, minhash_dedup
from qualityassurancetool_spark.operators.gradient import gradient_column
from qualityassurancetool_spark.operators.partitioned_windows import (
    calc_zscore_bucketed,
)
from qualityassurancetool_spark.operators.spatial_outlier import with_median_track
from qualityassurancetool_spark.operators.zscore import calc_zscore
from qualityassurancetool_spark.schema import OBSERVATIONS_SCHEMA


def _empty_obs(spark):
    return spark.createDataFrame([], OBSERVATIONS_SCHEMA)


def test_window_ops_on_empty(spark):
    obs = _empty_obs(spark)
    assert calc_zscore(obs).count() == 0
    assert calc_zscore_bucketed(obs).count() == 0
    assert with_median_track(obs, partition_cols=["datastream_id"]).count() == 0
    g = obs.select(
        gradient_column("result", "phenomenon_time", ["datastream_id"], ["iot_id"]).alias("g")
    )
    assert g.count() == 0


def test_asof_on_empty_sides(spark):
    obs = _empty_obs(spark)
    some = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "iot_id long, phenomenon_time string"
    ).select("iot_id", F.to_timestamp("phenomenon_time").alias("phenomenon_time"))
    # empty dependent -> empty out; empty independent -> all-null matches
    assert asof_nearest_join(obs.select("iot_id", "phenomenon_time"), some, 0.5).count() == 0
    out = asof_nearest_join(some, obs.select("iot_id", "phenomenon_time"), 0.5)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["ind_iot_id"] is None


def test_dedup_on_empty(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(docs).count() == 0
    assert minhash_dedup(docs).count() == 0


def test_round3_ops_on_empty(spark):
    from qualityassurancetool_spark.operators.lm_score import (
        CharLM,
        score_documents,
        train_char_lm,
    )
    from qualityassurancetool_spark.operators.mixing import mix_corpora
    from qualityassurancetool_spark.operators.vocab import (
        oov_stats,
        token_vocabulary,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert token_vocabulary(docs, top_k=10).count() == 0
    vocab = spark.createDataFrame([("a",)], ["token"])
    assert oov_stats(docs, vocab).count() == 0
    # empty mixture sources survive; weights over empties yield empties
    mix = mix_corpora({"a": docs, "b": docs}, {"a": 1.5, "b": 0.3})
    assert mix.count() == 0 and "mix_key" in mix.columns
    # a model trained on an empty corpus still scores (floor everywhere)
    lm = train_char_lm(docs)
    assert isinstance(lm, CharLM) and lm.alphabet >= 1
    probe = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    out = score_documents(probe, lm).collect()
    assert len(out) == 1 and out[0]["lm_logp"] is not None
    assert score_documents(docs, lm).count() == 0


def test_new_ops_on_empty(spark):
    from qualityassurancetool_spark.operators.decontam import (
        benchmark_ngram_overlap,
    )
    from qualityassurancetool_spark.operators.tfidf import top_terms_per_doc
    from qualityassurancetool_spark.operators.similarity import quantize_int8

    docs = spark.createDataFrame([], "doc_id long, text string")
    some = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    # empty train and empty bench both yield zero contaminated rows
    assert benchmark_ngram_overlap(docs, some, k=2).count() == 0
    assert benchmark_ngram_overlap(some, docs, k=2).count() == 0
    assert top_terms_per_doc(docs).count() == 0
    vecs = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert quantize_int8(vecs).count() == 0


def test_round3b_ops_on_empty_docs(spark):
    """The second round-3 operator batch on zero documents."""
    from qualityassurancetool_spark.operators.classifier import score_linear
    from qualityassurancetool_spark.operators.fingerprint import (
        document_fingerprints,
        fingerprint_overlap_pairs,
        near_dedup_against_corpus,
    )
    from qualityassurancetool_spark.operators.quality_filters import (
        compression_ratios,
        domain_reputation,
        redact_documents,
    )
    from qualityassurancetool_spark.operators.span_dedup import (
        duplicated_span_dedup,
    )
    from qualityassurancetool_spark.operators.text import script_profile
    from qualityassurancetool_spark.operators.urls import (
        dedup_by_canonical_url,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert document_fingerprints(docs).count() == 0
    assert fingerprint_overlap_pairs(docs).count() == 0
    assert duplicated_span_dedup(docs, window_tokens=5).count() == 0
    assert redact_documents(docs).count() == 0
    assert domain_reputation(docs).count() == 0
    assert compression_ratios(docs).count() == 0
    assert script_profile(docs).count() == 0
    assert score_linear(docs, [0.0] * 16, 0.0).count() == 0
    urls = spark.createDataFrame([], "doc_id long, url string")
    assert dedup_by_canonical_url(urls).count() == 0
    # empty NEW batch against a non-empty index, and vice versa
    some = spark.createDataFrame(
        [(1, "enough words to fingerprint across this sentence easily ok")],
        "doc_id long, text string",
    )
    idx = document_fingerprints(some, k=20, w=8)
    assert near_dedup_against_corpus(docs, idx).count() == 0
    out = near_dedup_against_corpus(
        some, document_fingerprints(docs)
    ).collect()
    assert len(out) == 1 and out[0]["kept"] is True


def test_round3b_sampling_clustering_on_empty(spark):
    import pytest

    from qualityassurancetool_spark.operators.clustering import kmeans_fit
    from qualityassurancetool_spark.operators.sampling import (
        weighted_sample_topk,
    )

    docs = spark.createDataFrame([], "doc_id long, grp string, w double")
    assert weighted_sample_topk(docs, 5, "w").count() == 0
    assert weighted_sample_topk(docs, 5, "w", strata_col="grp").count() == 0
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kmeans_fit(emb, k=2)


def test_round3_batch5_ops_on_empty(spark):
    """DSIR / line family / bloom / report / snapshot on zero rows."""
    from qualityassurancetool_spark.operators.bloom import (
        bloom_parameters,
        build_bloom,
        with_might_contain,
    )
    from qualityassurancetool_spark.operators.dsir import (
        dsir_resample,
        fit_log_ratio,
        importance_scores,
    )
    from qualityassurancetool_spark.operators.line_dedup import (
        c4_clean,
        corpus_line_dedup,
    )
    from qualityassurancetool_spark.operators.snapshot import snapshot_diff
    from qualityassurancetool_spark.plans.corpus_report import corpus_report

    docs = spark.createDataFrame([], "doc_id long, text string")
    some = spark.createDataFrame([(1, "hello world text")], ["doc_id", "text"])

    # DSIR: fitting on empty corpora yields the pure-smoothing model
    lr = fit_log_ratio(docs, docs, n_buckets=64)
    assert len(lr) == 64 and all(v == 0.0 for v in lr)
    assert importance_scores(docs, lr).count() == 0
    assert dsir_resample(docs, lr, k=5).count() == 0

    assert c4_clean(docs).count() == 0
    assert corpus_line_dedup(docs).count() == 0
    assert corpus_line_dedup(some).count() == 1  # empty hash side

    m, k = bloom_parameters(1, 0.01)
    words = build_bloom(docs, "text", m, k)  # empty filter: all zeros
    assert all(w == 0 for w in words)
    out = with_might_contain(some, "text", words, k)
    assert [r["might"] for r in out.collect()] == [False]

    assert corpus_report(docs).where(
        F.col("metric") == "docs"
    ).collect()[0]["value"] == 0.0
    assert snapshot_diff(docs, docs).count() == 0
    assert {
        r["status"] for r in snapshot_diff(docs, some).collect()
    } == {"added"}

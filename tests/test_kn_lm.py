"""Kneser-Ney bigram LM (operators/kn_lm): hand-computed probabilities,
simplex property, floor behavior."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.kn_lm import (
    score_kn,
    train_kn_bigram,
)


def _model(spark):
    # reference corpus: "a b a b a c" -> bigrams: ab, ba, ab, ba, ac
    ref = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string"
    )
    return train_kn_bigram(ref, discount=0.75, k=0.5)


def test_hand_computed_stats(spark):
    m = _model(spark)
    big = {(r["w1"], r["w2"]): r["c"] for r in m.bigrams.collect()}
    assert big == {("a", "b"): 2, ("b", "a"): 2, ("a", "c"): 1}
    ctx = {r["w1"]: (r["c1"], r["n_follow"]) for r in m.contexts.collect()}
    assert ctx == {"a": (3, 2), "b": (2, 1)}
    assert m.n_types == 3 and m.vocab == 3


def test_hand_computed_probability(spark):
    """P(b|a) = (2-0.75)/3 + 0.75*2/3 * Pcont(b),
    Pcont(b) = (1+0.5)/(3+0.5*3)."""
    m = _model(spark)
    doc = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    got = score_kn(m, doc).collect()[0]
    pcont_b = (1 + 0.5) / (3 + 0.5 * 3)
    expect = (2 - 0.75) / 3 + 0.75 * 2 / 3 * pcont_b
    assert got["n_bigrams"] == 1
    assert got["kn_logp"] == pytest.approx(math.log(expect), rel=1e-12)


def test_unseen_context_and_floor(spark):
    m = _model(spark)
    docs = spark.createDataFrame(
        [(1, "z a"), (2, "solo"), (3, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in score_kn(m, docs).collect()}
    # unseen context 'z' backs off to Pcont(a) = (1+0.5)/(3+1.5)
    assert out[1]["kn_logp"] == pytest.approx(
        math.log((1 + 0.5) / (3 + 1.5)), rel=1e-12
    )
    # <2 tokens: exact floor
    for i in (2, 3):
        assert out[i]["n_bigrams"] == 0
        assert out[i]["kn_logp"] == pytest.approx(m.floor_logp, rel=1e-12)


def test_seen_context_simplex(spark):
    """For a seen context, P(w2|w1) sums to ~1 over the bigram vocab
    plus the unseen-word mass (the add-k floor deliberately leaks a
    little mass to unseen words — verify the seen-vocab sum is close
    to but below 1)."""
    m = _model(spark)
    vocab = ["a", "b", "c"]
    docs = spark.createDataFrame(
        [(i, f"a {w}") for i, w in enumerate(vocab)],
        "doc_id long, text string",
    )
    ps = [
        math.exp(r["kn_logp"])
        for r in score_kn(m, docs).collect()
    ]
    assert 0.9 < sum(ps) <= 1.0 + 1e-9


def test_reference_slice_scores_best(spark):
    ref_docs = [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    other = [(100, "zzz qqq xxx www yyy vvv")]
    df = spark.createDataFrame(
        ref_docs + other, "doc_id long, text string"
    )
    m = train_kn_bigram(df.where(F.col("doc_id") < 100))
    out = {r["doc_id"]: r["kn_logp"] for r in score_kn(m, df).collect()}
    assert out[0] > out[100]

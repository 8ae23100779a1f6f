"""Hashed log-odds linear classifier (operators/classifier)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.classifier import (
    score_linear,
    train_log_odds,
)

POS = ["good clean prose here", "clean useful prose text", "good useful text here"]
NEG = ["spam buy now click", "click spam offer now", "buy offer click spam"]


def _train_df(spark):
    rows = [(i, t, True) for i, t in enumerate(POS)] + [
        (10 + i, t, False) for i, t in enumerate(NEG)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label boolean")


def test_separates_training_classes(spark):
    df = _train_df(spark)
    w, b = train_log_odds(df, n_buckets=256)
    scored = {r["doc_id"]: r["prob"] for r in score_linear(
        df, w, b, n_buckets=256
    ).collect()}
    assert min(scored[i] for i in range(3)) > max(
        scored[10 + i] for i in range(3)
    )


def test_generalizes_to_held_out_tokens(spark):
    w, b = train_log_odds(_train_df(spark), n_buckets=256)
    test = spark.createDataFrame(
        [(100, "clean good prose"), (101, "spam click buy")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["prob"] for r in score_linear(
        test, w, b, n_buckets=256
    ).collect()}
    assert out[100] > out[101]


def test_empty_doc_scores_bias(spark):
    w, b = train_log_odds(_train_df(spark), n_buckets=256)
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = score_linear(df, w, b, n_buckets=256).collect()[0]
    assert row["n_features"] == 0
    assert row["score"] == pytest.approx(b)
    assert row["prob"] == pytest.approx(1.0 / (1.0 + math.exp(-b)))


def test_fast_mode_orders_same(spark):
    df = _train_df(spark)
    w, b = train_log_odds(df, n_buckets=256, hash_mode="fast")
    scored = {r["doc_id"]: r["prob"] for r in score_linear(
        df, w, b, n_buckets=256, hash_mode="fast"
    ).collect()}
    assert min(scored[i] for i in range(3)) > max(
        scored[10 + i] for i in range(3)
    )


def test_scoring_plan_has_no_join_or_python(spark):
    w, b = train_log_odds(_train_df(spark), n_buckets=256)
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        score_linear(df, w, b, n_buckets=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_bucket_mismatch_raises(spark):
    with pytest.raises(ValueError):
        score_linear(_train_df(spark), [0.0] * 10, 0.0, n_buckets=20)

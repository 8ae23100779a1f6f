"""Binary-classifier evaluation metrics: hand-computed AUC with
ties, loss identities, threshold tables, PR curves, quantized-score
approximation."""

import math

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.ml_eval import (
    binary_metrics,
    confusion_at_thresholds,
    pr_curve,
)


def _metrics_row(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["score", "label"])
    return binary_metrics(df, "score", "label", **kw).collect()[0]


def test_auc_hand_computed_with_ties(spark):
    # scores: pos at 0.8, 0.5; neg at 0.5, 0.2
    # pairs: (0.8 vs 0.5)=1, (0.8 vs 0.2)=1, (0.5 vs 0.5)=0.5,
    # (0.5 vs 0.2)=1  ->  AUC = 3.5/4
    r = _metrics_row(
        spark,
        [(0.8, 1), (0.5, 1), (0.5, 0), (0.2, 0)],
    )
    assert r["auc"] == pytest.approx(3.5 / 4)
    assert r["n"] == 4 and r["n_pos"] == 2 and r["n_neg"] == 2


def test_auc_perfect_and_inverted(spark):
    rows = [(0.9, 1), (0.8, 1), (0.3, 0), (0.1, 0)]
    assert _metrics_row(spark, rows)["auc"] == pytest.approx(1.0)
    flipped = [(s, 1 - y) for s, y in rows]
    assert _metrics_row(spark, flipped)["auc"] == pytest.approx(0.0)


def test_auc_all_tied_is_half(spark):
    r = _metrics_row(spark, [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)])
    assert r["auc"] == pytest.approx(0.5)


def test_auc_single_class_null(spark):
    r = _metrics_row(spark, [(0.9, 1), (0.1, 1)])
    assert r["auc"] is None
    # loss metrics still defined
    assert r["log_loss"] == pytest.approx(
        -(math.log(0.9) + math.log(0.1)) / 2
    )


def test_log_loss_and_brier_hand_computed(spark):
    r = _metrics_row(spark, [(0.8, 1), (0.4, 0)])
    assert r["log_loss"] == pytest.approx(
        -(math.log(0.8) + math.log(0.6)) / 2
    )
    assert r["brier"] == pytest.approx((0.2**2 + 0.4**2) / 2)


def test_log_loss_clips_degenerate_scores(spark):
    # score exactly 0 on a positive would be -inf without clipping
    r = _metrics_row(spark, [(0.0, 1), (1.0, 0)])
    assert math.isfinite(r["log_loss"])
    assert r["log_loss"] > 30  # ~ -ln(1e-15)


def test_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [(0.9, 1), (None, 1), (0.2, None), (0.1, 0)],
        "score double, label int",
    )
    r = binary_metrics(df, "score", "label").collect()[0]
    assert r["n"] == 2 and r["auc"] == pytest.approx(1.0)


def test_grouped_metrics_independent(spark):
    df = spark.createDataFrame(
        [("a", 0.9, 1), ("a", 0.1, 0), ("b", 0.2, 1), ("b", 0.8, 0)],
        ["g", "score", "label"],
    )
    out = {
        r["g"]: r["auc"]
        for r in binary_metrics(
            df, "score", "label", group_cols=["g"]
        ).collect()
    }
    assert out["a"] == pytest.approx(1.0)
    assert out["b"] == pytest.approx(0.0)


def test_score_bins_bounds_error(spark):
    import random

    rng = random.Random(7)
    rows = []
    for _ in range(400):
        y = rng.random() < 0.5
        s = min(
            max(rng.gauss(0.65 if y else 0.35, 0.18), 0.0), 1.0
        )
        rows.append((s, int(y)))
    exact = _metrics_row(spark, rows)["auc"]
    approx = _metrics_row(spark, rows, score_bins=100)["auc"]
    assert abs(approx - exact) <= 1.5 / 100
    with pytest.raises(ValueError):
        _metrics_row(spark, rows, score_bins=1)


def test_confusion_at_thresholds_hand_computed(spark):
    df = spark.createDataFrame(
        [(0.9, 1), (0.6, 0), (0.4, 1), (0.1, 0)],
        ["score", "label"],
    )
    out = {
        r["threshold"]: r
        for r in confusion_at_thresholds(
            df, [0.5, 0.95], "score", "label"
        ).collect()
    }
    r5 = out[0.5]
    assert (r5["tp"], r5["fp"], r5["tn"], r5["fn"]) == (1, 1, 1, 1)
    assert r5["precision"] == pytest.approx(0.5)
    assert r5["recall"] == pytest.approx(0.5)
    assert r5["f1"] == pytest.approx(0.5)
    assert r5["accuracy"] == pytest.approx(0.5)
    r95 = out[0.95]
    assert (r95["tp"], r95["fp"]) == (0, 0)
    assert r95["precision"] is None  # 0/0
    assert r95["recall"] == pytest.approx(0.0)
    assert r95["f1"] is None


def test_confusion_threshold_validation(spark):
    df = spark.createDataFrame([(0.5, 1)], ["score", "label"])
    with pytest.raises(ValueError):
        confusion_at_thresholds(df, [], "score", "label")
    with pytest.raises(ValueError):
        confusion_at_thresholds(df, [0.5, 0.5], "score", "label")


def test_pr_curve_descending_cutoffs(spark):
    df = spark.createDataFrame(
        [(0.9, 1), (0.7, 0), (0.7, 1), (0.2, 0)],
        ["score", "label"],
    )
    out = pr_curve(df, "score", "label").orderBy(
        F.desc("score")
    ).collect()
    assert [r["score"] for r in out] == [0.9, 0.7, 0.2]
    assert [(r["tp"], r["fp"]) for r in out] == [
        (1, 0),
        (2, 1),
        (2, 2),
    ]
    assert out[0]["precision"] == pytest.approx(1.0)
    assert out[1]["recall"] == pytest.approx(1.0)
    # recall non-decreasing as the cutoff drops
    recs = [r["recall"] for r in out]
    assert recs == sorted(recs)


def test_pr_curve_agrees_with_confusion(spark):
    import random

    rng = random.Random(3)
    rows = [
        (round(rng.random(), 2), rng.randint(0, 1))
        for _ in range(120)
    ]
    df = spark.createDataFrame(rows, ["score", "label"])
    pr = {
        r["score"]: (r["tp"], r["fp"])
        for r in pr_curve(df, "score", "label").collect()
    }
    cutoff = sorted(pr)[len(pr) // 2]
    conf = confusion_at_thresholds(
        df, [float(cutoff)], "score", "label"
    ).collect()[0]
    assert pr[cutoff] == (conf["tp"], conf["fp"])


def test_binary_metrics_trained_model_sanity(spark, sf_dir):
    """End-to-end with the logreg trainer: a model fit on separable
    synthetic features scores AUC near 1, far above a random score."""
    from qualityassurancetool_spark.operators.logreg import (
        apply_logistic_regression,
        train_logistic_regression,
    )

    h = F.xxhash64("l_orderkey", "l_linenumber")
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .limit(2000)
        .select(
            (F.col("l_quantity") / 50).alias("x1"),
            F.col("l_discount").alias("x2"),
            ((F.col("l_quantity") / 50 - F.col("l_discount")) > 0.4)
            .cast("int")
            .alias("label"),
            ((h % 1000) / 1000.0).alias("noise"),
        )
    )
    m = train_logistic_regression(df, ["x1", "x2"], "label", iters=30)
    scored = apply_logistic_regression(df, m)
    auc = binary_metrics(scored, "score", "label").collect()[0]["auc"]
    rand_auc = binary_metrics(scored, "noise", "label").collect()[0][
        "auc"
    ]
    assert auc > 0.97
    assert 0.35 < rand_auc < 0.65


def test_counts_injection_parity(spark):
    # counts= (the shared score_counts frame) must reproduce the
    # df-scanning path bit-for-bit for all three evaluators — the
    # mechanism q_ml_eval uses to share one scan across its union
    # branches (round-11 optimization regression net)
    from qualityassurancetool_spark.operators.ml_eval import (
        score_counts,
    )

    rows = [
        ("A", 0.8, 1), ("A", 0.5, 1), ("A", 0.5, 0), ("A", 0.2, 0),
        ("B", 0.9, 0), ("B", 0.9, 1), ("B", 0.1, 0), ("B", 0.4, 1),
    ]
    df = spark.createDataFrame(rows, ["g", "score", "label"])
    base = score_counts(df, "score", "label", ["g"])
    gbase = base.groupBy("_s").agg(
        F.sum("_pos").alias("_pos"), F.sum("_neg").alias("_neg")
    )

    m0 = binary_metrics(df, "score", "label", ["g"]).collect()
    m1 = binary_metrics(
        df, "score", "label", ["g"], counts=base
    ).collect()
    assert sorted(map(tuple, m0)) == sorted(map(tuple, m1))

    c0 = confusion_at_thresholds(df, [0.3, 0.6], "score", "label").collect()
    c1 = confusion_at_thresholds(
        df, [0.3, 0.6], "score", "label", counts=gbase
    ).collect()
    assert sorted(map(tuple, c0)) == sorted(map(tuple, c1))

    p0 = pr_curve(df, "score", "label").collect()
    p1 = pr_curve(df, "score", "label", counts=gbase).collect()
    assert sorted(map(tuple, p0)) == sorted(map(tuple, p1))


def test_counts_injection_validates_columns(spark):
    df = spark.createDataFrame([(0.5, 1)], ["score", "label"])
    bad = spark.createDataFrame([(0.5, 1.0)], ["_s", "_pos"])
    with pytest.raises(ValueError, match="score_counts"):
        binary_metrics(df, "score", "label", counts=bad)
    with pytest.raises(ValueError, match="score_counts"):
        pr_curve(df, "score", "label", counts=bad)
    with pytest.raises(ValueError, match="score_counts"):
        confusion_at_thresholds(df, [0.5], "score", "label", counts=bad)

"""Isotonic calibration (operators/calibration): PAV correctness by
optimality property, binned fit + Column apply end-to-end."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.calibration import (
    isotonic_apply,
    isotonic_fit,
    pav,
)


def _sse(fit, values, weights):
    return sum(w * (f - v) ** 2 for f, v, w in zip(fit, values, weights))


def test_pav_hand_example():
    # classic pooling: the 0.8/0.2 violation pools to their mean
    vals, wts = [0.1, 0.8, 0.2, 0.9], [1, 1, 1, 1]
    assert pav(vals, wts) == [0.1, 0.5, 0.5, 0.9]
    # weighted pooling
    assert pav([1.0, 0.0], [3, 1]) == [0.75, 0.75]
    # already monotone: unchanged
    assert pav([0.1, 0.2, 0.9], [1, 2, 3]) == [0.1, 0.2, 0.9]


def test_pav_is_the_optimal_monotone_fit():
    """PAV must (a) be non-decreasing and (b) beat every monotone
    candidate on a value grid — the defining optimality, checked
    exhaustively on small random instances."""
    rng = random.Random(7)
    grid = [i / 4 for i in range(5)]
    for _ in range(25):
        n = rng.randint(2, 4)
        vals = [rng.choice(grid) for _ in range(n)]
        wts = [rng.choice([1, 2, 3]) for _ in range(n)]
        fit = pav(vals, wts)
        assert all(a <= b + 1e-12 for a, b in zip(fit, fit[1:]))
        best = min(
            _sse(c, vals, wts)
            for c in itertools.product(grid, repeat=n)
            if all(a <= b for a, b in zip(c, c[1:]))
        )
        # PAV's optimum is over ALL reals, so it is <= the grid optimum
        assert _sse(fit, vals, wts) <= best + 1e-9


def test_fit_apply_end_to_end(spark):
    """Planted monotone relationship with one violating pocket: the
    calibrated rates are monotone, pool the violation, and the Column
    apply reproduces the model bin-for-bin."""
    rows = []
    # score in [0,1); true rate rises with score except a pocket at
    # [0.4, 0.5) that is artificially perfect (violation to pool)
    for i in range(1000):
        s = (i % 100) / 100.0
        rate = 1.0 if 0.4 <= s < 0.5 else s
        rows.append((s, 1.0 if (i * 2654435761 % 997) / 997.0 < rate else 0.0))
    df = spark.createDataFrame(rows, ["score", "label"])
    model = isotonic_fit(df, "score", "label", n_bins=10)
    r = model["rates"]
    assert all(a <= b + 1e-12 for a, b in zip(r, r[1:]))  # monotone
    assert r[0] < 0.35 and r[-1] > 0.75                   # ends anchored
    got = (
        df.select(
            "score", isotonic_apply(model, F.col("score")).alias("p")
        )
        .distinct()
        .collect()
    )
    for row in got:
        b = min(int((row["score"] - model["lo"]) /
                    ((model["hi"] - model["lo"]) or 1.0) * 10), 9)
        assert row["p"] == pytest.approx(r[b])
    # clamping beyond the training range
    edge = spark.createDataFrame([(-5.0,), (99.0,)], ["score"]).select(
        isotonic_apply(model, F.col("score")).alias("p")
    ).collect()
    assert edge[0]["p"] == pytest.approx(r[0])
    assert edge[1]["p"] == pytest.approx(r[-1])


def test_validation_and_empty_bins(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (10.0, 1.0)], ["score", "label"]
    )
    model = isotonic_fit(df, "score", "label", n_bins=5)
    # middle bins are empty: inherit the nearest populated rate left
    assert model["rates"] == [0.0, 0.0, 0.0, 0.0, 1.0]
    with pytest.raises(ValueError):
        isotonic_fit(df, "score", "label", n_bins=1)
    with pytest.raises(ValueError):
        isotonic_fit(
            spark.createDataFrame([(None, 1.0)], "score double, label double"),
            "score",
            "label",
        )


def test_unclamped_out_of_range_is_null_not_wrapped(spark):
    """clamp=False: out-of-range scores are NULL — never a negative
    element_at index that wraps to the TOP bins (review finding)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0.0, 0.0), (10.0, 1.0)], ["score", "label"]
    )
    model = isotonic_fit(df, "score", "label", n_bins=5)
    rows = (
        spark.createDataFrame(
            [(-0.05,), (-5.0,), (5.0,), (99.0,)], ["score"]
        )
        .select(
            "score",
            isotonic_apply(model, F.col("score"), clamp=False).alias("p"),
        )
        .orderBy("score")
        .collect()
    )
    assert rows[0]["p"] is None and rows[1]["p"] is None  # below range
    assert rows[2]["p"] is not None                        # in range
    assert rows[3]["p"] is None                            # above range


def test_unclamped_max_score_is_in_range(spark):
    """score == hi is training data; clamp=False must return the top
    bin's rate for it, not NULL (review finding)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0.0, 0.0), (10.0, 1.0)], ["score", "label"]
    )
    model = isotonic_fit(df, "score", "label", n_bins=5)
    p = (
        spark.createDataFrame([(10.0,)], ["score"])
        .select(isotonic_apply(model, F.col("score"), clamp=False).alias("p"))
        .collect()[0]["p"]
    )
    assert p == pytest.approx(model["rates"][-1])


def test_calibrated_classifier_end_to_end(spark):
    """train_log_odds → calibrated_classifier → apply_calibrated: the
    calibrated probabilities are monotone in the raw score and track
    the empirical label rate far better than the raw sigmoid."""
    from pyspark.sql import functions as F

    from qualityassurancetool_spark.operators.calibration import (
        apply_calibrated,
        calibrated_classifier,
    )
    from qualityassurancetool_spark.operators.classifier import (
        train_log_odds,
    )

    good = "plenty of clean readable prose words in this document body"
    spam = "zz buy now zz click here zz buy now zz click zz"
    rows = []
    for i in range(300):
        if i % 2 == 0:
            rows.append((i, f"{good} variant {i}", True))
        else:
            rows.append((i, f"{spam} variant {i}", False))
    labeled = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    model = train_log_odds(labeled)
    calib = calibrated_classifier(labeled, model, n_bins=10)
    out = apply_calibrated(labeled, model, calib).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    rowsb = out.select("label", "prob", "calibrated_prob").collect()
    # calibrated probs separate the classes and live in [0, 1]
    pos = [r["calibrated_prob"] for r in rowsb if r["label"]]
    neg = [r["calibrated_prob"] for r in rowsb if not r["label"]]
    assert min(pos) > max(neg)
    assert all(0.0 <= p <= 1.0 for p in pos + neg)
    # perfect separation in this fixture: calibrated rates hit the
    # empirical extremes where the raw sigmoid does not
    assert sum(pos) / len(pos) > 0.95
    assert sum(neg) / len(neg) < 0.05
    # monotone w.r.t. raw score
    srt = sorted(rowsb, key=lambda r: r["prob"])
    cal = [r["calibrated_prob"] for r in srt]
    assert all(a <= b + 1e-12 for a, b in zip(cal, cal[1:]))

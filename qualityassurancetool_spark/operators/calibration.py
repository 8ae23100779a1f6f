"""Isotonic (monotone) score calibration — classifier scores → true
match rates.

The quality/fasttext-style classifiers this engine trains
(``operators/classifier``, ``operators/lm_score``) emit uncalibrated
scores; curation thresholds ("keep if P(good) ≥ 0.8") need
PROBABILITIES.  Isotonic regression (pool-adjacent-violators, PAV —
Ayer et al. 1955; the standard calibration method of Zadrozny &
Elkan KDD 2002) fits the best monotone step function from score to
empirical label rate, assuming only that more score ⇒ no less likely
good.

Spark shape (same two-phase pattern as PCA): scores bin into
``n_bins`` fixed-width buckets with ONE partial agg — per-bin (label
sum, count) — so only ``n_bins`` rows reach the driver; PAV runs on
those bins (O(n_bins), exact); application is pure Column arithmetic
(bucket index → literal array lookup), no UDF, no second shuffle.
Binned PAV is the standard large-scale formulation (exact PAV over
per-bin sufficient statistics ≡ PAV over the sorted raw scores when
ties-within-bin are acceptable at 1/n_bins score resolution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pav(values: list[float], weights: list[float]) -> list[float]:
    """Pool-adjacent-violators: the isotonic (non-decreasing) fit
    minimizing weighted squared error.  Returns the fitted value per
    input position.  Classic stack formulation, O(n)."""
    if len(values) != len(weights):
        raise ValueError("values/weights length mismatch")
    # stack of (mean, weight, count of source bins)
    stack: list[list[float]] = []
    for v, w in zip(values, weights):
        stack.append([float(v), float(w), 1])
        while len(stack) > 1 and stack[-2][0] >= stack[-1][0]:
            m2, w2, c2 = stack.pop()
            m1, w1, c1 = stack.pop()
            tot = w1 + w2
            stack.append(
                [(m1 * w1 + m2 * w2) / tot if tot else m1, tot, c1 + c2]
            )
    out: list[float] = []
    for mean, _w, c in stack:
        out.extend([mean] * c)
    return out


def pav_sums(sums: list[float], weights: list[float]) -> list[float]:
    """:func:`pav` pooling (SUM, WEIGHT) pairs instead of (mean,
    weight): a pooled block's mean is ONE division of the exact
    accumulated sums — with integer-valued inputs (0/1 label sums and
    bin counts) every fitted value is bit-identical to the closed-form
    minimax expression ``max_{j<=i} min_{k>=i} (Σpos/Σn over j..k)``,
    which is what lets an independent SQL engine replay the fit exactly
    (the declared ``isotonic`` gate query).  The mean-combining form
    ``(m1*w1+m2*w2)/tot`` drifts ULPs from that per pooling step."""
    if len(sums) != len(weights):
        raise ValueError("sums/weights length mismatch")
    stack: list[list[float]] = []  # [sum, weight, count of source bins]
    for s, w in zip(sums, weights):
        stack.append([float(s), float(w), 1])
        # violator test by CROSS-MULTIPLICATION (s1/w1 >= s2/w2 <=>
        # s1*w2 >= s2*w1 for positive weights): exact in doubles while
        # the products stay under 2^53 — no division rounding can flip
        # a pooling decision.  The final mean is then ONE correctly-
        # rounded division, so fl monotonicity carries the PAV==minimax
        # identity into floating point verbatim.
        while len(stack) > 1 and (
            stack[-2][0] * stack[-1][1] >= stack[-1][0] * stack[-2][1]
        ):
            s2, w2, c2 = stack.pop()
            s1, w1, c1 = stack.pop()
            stack.append([s1 + s2, w1 + w2, c1 + c2])
    out: list[float] = []
    for s, w, c in stack:
        out.extend([s / w if w else 0.0] * c)
    return out


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 100,
) -> dict:
    """Calibration model fitted on (score, binary/0-1 label) rows:
    ``{"lo", "hi", "n_bins", "rates": [per-bin calibrated rate]}``.
    Empty bins inherit the fitted rate of the nearest populated bin to
    the left (monotonicity makes that the correct lower envelope);
    leading empties take the first populated rate."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    base = df.select(
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("double").alias("_y"),
    ).where(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    r = base.agg(
        F.min("_s").alias("lo"), F.max("_s").alias("hi")
    ).collect()[0]
    if r["lo"] is None:
        raise ValueError("no non-null (score, label) rows to calibrate on")
    lo, hi = float(r["lo"]), float(r["hi"])
    span = (hi - lo) or 1.0
    binned = (
        base.select(
            F.least(
                F.floor((F.col("_s") - lo) / span * n_bins).cast("int"),
                F.lit(n_bins - 1),
            ).alias("bin"),
            "_y",
        )
        .groupBy("bin")
        .agg(F.sum("_y").alias("pos"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_bin = {int(b["bin"]): (float(b["pos"]), int(b["n"])) for b in binned}
    filled = [by_bin.get(i, (0.0, 0)) for i in range(n_bins)]
    populated = [i for i, (_p, n) in enumerate(filled) if n > 0]
    # exact-sum pooling: fitted rates are single integer/integer
    # divisions, bit-identical to the minimax closed form the declared
    # `isotonic` gate query's SQL oracle computes
    fit_vals = pav_sums(
        [filled[i][0] for i in populated],
        [float(filled[i][1]) for i in populated],
    )
    rates = [0.0] * n_bins
    cur = fit_vals[0]
    j = 0
    for i in range(n_bins):
        if j < len(populated) and i == populated[j]:
            cur = fit_vals[j]
            j += 1
        rates[i] = cur
    return {"lo": lo, "hi": hi, "n_bins": n_bins, "rates": rates}


def isotonic_apply(
    model: dict, score: Column, clamp: bool = True
) -> Column:
    """Calibrated probability Column for ``score`` under ``model`` —
    bucket index arithmetic + one literal array lookup, whole-stage
    codegen, no UDF.  Out-of-range scores clamp to the edge bins (the
    isotonic step function is constant beyond the training range);
    with ``clamp=False`` they yield NULL instead — never a wrapped
    index (``element_at`` counts negative indices from the array END,
    which would hand the LOWEST scores near-maximal probabilities)."""
    lo, hi = model["lo"], model["hi"]
    n = model["n_bins"]
    span = (hi - lo) or 1.0
    idx = F.floor((score - F.lit(lo)) / F.lit(span) * n).cast("int")
    rates = F.array(*[F.lit(float(v)) for v in model["rates"]])
    clamped = F.greatest(F.lit(0), F.least(idx, F.lit(n - 1)))
    looked = F.element_at(rates, clamped + 1)
    if clamp:
        return looked
    # in-range test on the SCORE, not the bucket index: score == hi is
    # training data (isotonic_fit folds it into the top bin) but maps
    # to idx == n (review finding)
    return F.when((score >= F.lit(lo)) & (score <= F.lit(hi)), looked)


def calibrated_classifier(
    labeled: DataFrame,
    model: tuple[list[float], float],
    n_bins: int = 50,
    score_col: str = "prob",
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Fit the isotonic calibration map for a trained quality
    classifier (``operators/classifier.train_log_odds``) on a held-out
    labeled frame — the full fastText-style serving recipe (Zadrozny &
    Elkan 2002: raw discriminant scores are NOT probabilities; curation
    thresholds like ``min_classifier_prob=0.8`` only mean "80 % likely
    good" after this map).

    Returns the :func:`isotonic_fit` model dict over the classifier's
    sigmoid outputs.  Apply with :func:`apply_calibrated` — one
    classifier fold + one literal-array lookup per row, no UDF, no
    extra shuffle."""
    from qualityassurancetool_spark.operators.classifier import (
        score_linear,
    )

    weights, bias = model
    scored = score_linear(
        labeled.select(id_col, text_col),
        weights,
        bias,
        text_col=text_col,
        id_col=id_col,
    ).join(labeled.select(id_col, label_col), id_col)
    return isotonic_fit(
        scored.select(
            F.col(score_col),
            F.col(label_col).cast("double").alias(label_col),
        ),
        score_col,
        label_col,
        n_bins=n_bins,
    )


def apply_calibrated(
    df: DataFrame,
    model: tuple[list[float], float],
    calib: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "calibrated_prob",
    score_col: str = "prob",
) -> DataFrame:
    """(input columns…, raw scores, ``out_col``) — classifier scoring
    + the isotonic map in one pass.  ``score_col`` MUST match the
    column the calibration was fitted on (``calibrated_classifier``'s
    own ``score_col``): feeding sigmoid probs through a map fitted on
    raw log-odds silently clamps everything into one bin (review
    finding — the two functions now share the knob)."""
    from qualityassurancetool_spark.operators.classifier import (
        score_linear,
    )

    weights, bias = model
    scored = score_linear(
        df, weights, bias, text_col=text_col, id_col=id_col
    )
    return scored.withColumn(
        out_col, isotonic_apply(calib, F.col(score_col))
    )

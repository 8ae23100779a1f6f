"""Distributed logistic-regression training — full-batch gradient
descent as iterated aggregation.

Complements ``operators/classifier`` (hashed naive-Bayes log-odds —
the one-pass closed form) with an actually-FITTED linear model over
numeric feature columns: the final quality-score layer of a curation
pipeline (combine Gopher signals, compression ratio, LM bucket,
domain reputation into one calibrated gate) trained in the same
engine that computes the signals.

Spark shape: weights live on the DRIVER (d+1 doubles — model
metadata, the IVF-centroid/PQ-codebook convention); each GD
iteration is ONE map-side-combined aggregate pass computing the
batch gradient ``mean((sigmoid(w·x+b) − y)·x_j)`` with the current
weights folded in as literals — d+1 doubles shuffle per pass, the
data is never re-keyed, and every pass is a full scan (cache the
input for iteration).  Full-batch GD is deterministic — no sampling,
no row order dependence (floating-point partial-sum order aside) —
which is what makes the cross-engine oracle possible:
``tools/extra_oracles.py::x_logreg`` replays the SAME unrolled
iterations in DuckDB SQL and matches coefficients to 6 dp.

At 100 TB: each iteration costs one scan; standardized features keep
the iteration count low (tens), and the aggregate itself is the
cheapest possible shape (no shuffle of data rows).  Swap in L-BFGS
by accumulating the same gradient plus curvature pairs if iteration
budget ever dominates — the per-pass dataflow is unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _margin(
    feature_cols: list[str], w: list[float], b: float
) -> Column:
    z = F.lit(float(b))
    for c, wj in zip(feature_cols, w):
        z = z + F.col(c).cast("double") * F.lit(float(wj))
    return z


def train_logistic_regression(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 50,
    lr: float = 1.0,
    l2: float = 0.0,
    standardize: bool = True,
) -> dict:
    """Fit ``P(y=1) = sigmoid(w·x + b)`` by full-batch gradient
    descent; returns ``{"weights": [...], "bias": float, "n": int,
    "feature_cols": [...], "standardize": {...} | None}`` in the
    ORIGINAL feature space (standardization, when on, is folded back
    into the returned coefficients).

    Rows with any NULL feature or label are dropped.  ``label_col``
    must be 0/1 (numeric or boolean).  ``l2`` penalizes weights, not
    the bias (the standard convention).
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    cols = [F.col(c).cast("double").alias(c) for c in feature_cols]
    y = F.col(label_col).cast("double").alias("_y")
    cond = F.col(label_col).isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    data = df.where(cond).select(*cols, y)
    data.persist()
    try:
        if standardize:
            stats = data.agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.avg(c).alias(f"_mu_{c}") for c in feature_cols],
                *[
                    F.stddev_pop(c).alias(f"_sd_{c}")
                    for c in feature_cols
                ],
            ).collect()[0]
            if int(stats["_n"]) == 0:
                raise ValueError("no complete rows to train on")
            mu = [float(stats[f"_mu_{c}"]) for c in feature_cols]
            sd = [
                float(stats[f"_sd_{c}"]) or 1.0
                for c in feature_cols
            ]
            sd = [s if s > 0 else 1.0 for s in sd]
            data = data.select(
                *[
                    (
                        (F.col(c) - F.lit(m)) / F.lit(s)
                    ).alias(c)
                    for c, m, s in zip(feature_cols, mu, sd)
                ],
                "_y",
            )
            data.persist()
        w = [0.0] * len(feature_cols)
        b = 0.0
        n = None
        for _ in range(iters):
            p = _sigmoid(_margin(feature_cols, w, b))
            err = p - F.col("_y")
            row = data.agg(
                F.count(F.lit(1)).alias("_n"),
                F.avg(err).alias("_gb"),
                *[
                    F.avg(err * F.col(c)).alias(f"_g_{c}")
                    for c in feature_cols
                ],
            ).collect()[0]
            n = int(row["_n"])
            if n == 0:
                raise ValueError("no complete rows to train on")
            b -= lr * float(row["_gb"])
            w = [
                wj
                - lr * (float(row[f"_g_{c}"]) + l2 * wj)
                for wj, c in zip(w, feature_cols)
            ]
        std_meta = None
        if standardize:
            # fold z-scaling back: w_orig = w/sd, b_orig = b - Σ w·mu/sd
            std_meta = {"mu": mu, "sd": sd}
            b = b - sum(
                wj * m / s for wj, m, s in zip(w, mu, sd)
            )
            w = [wj / s for wj, s in zip(w, sd)]
        return {
            "weights": w,
            "bias": b,
            "n": n,
            "feature_cols": list(feature_cols),
            "standardize": std_meta,
        }
    finally:
        data.unpersist()


def apply_logistic_regression(
    df: DataFrame,
    model: dict,
    score_col: str = "score",
) -> DataFrame:
    """Add ``sigmoid(w·x + b)`` as ``score_col`` — pure Column
    arithmetic against the literal coefficients, no join, no UDF."""
    z = _margin(
        model["feature_cols"], model["weights"], model["bias"]
    )
    return df.withColumn(score_col, _sigmoid(z))

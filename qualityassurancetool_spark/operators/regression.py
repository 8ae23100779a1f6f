"""Grouped ordinary-least-squares and correlation — closed-form
moment aggregation, one shuffle, no iteration.

``grouped_ols`` fits y = a·x + b per group from the five sufficient
moments (n, Σx, Σy, Σxy, Σx²) in a SINGLE partial-aggregated pass —
the textbook closed form, which is also exactly how a 100 TB fit
must run: the moments combine associatively (map-side combine does
most of the work), the shuffle carries five doubles per group, and
no row is visited twice.  Trend-per-entity at corpus scale (drift of
a quality score over time per domain, throughput slope per stream)
is this shape.

``correlation_pairs`` computes the Pearson matrix over any set of
numeric columns in the same one-pass style: per pair, the co-moment
aggregation (the pair list is columns², driver-side metadata — the
DATA pass is still single).

Null discipline: a row enters a fit/pair only if BOTH of its values
are non-null (pairwise deletion, matching SQL's ``regr_*``/``corr``
aggregates, which the cross-engine oracle uses directly).

Cross-engine: ``tools/extra_oracles.py::x_ols`` — DuckDB
``regr_slope/regr_intercept/regr_r2/corr`` replica.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _ols_cols(x: Column, y: Column) -> dict[str, Column]:
    both = x.isNotNull() & y.isNotNull()
    xs = F.when(both, x)
    ys = F.when(both, y)
    return {
        "n": F.count(xs),
        "sx": F.sum(xs),
        "sy": F.sum(ys),
        "sxy": F.sum(xs * ys),
        "sxx": F.sum(xs * xs),
        "syy": F.sum(ys * ys),
    }


def grouped_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    min_points: int = 2,
) -> DataFrame:
    """Per-group OLS fit of ``y = slope·x + intercept``:
    ``(group..., n, slope, intercept, r2)``.

    Groups with fewer than ``min_points`` complete (x, y) pairs, or
    with zero x-variance, yield NULL slope/intercept/r2 (degenerate
    fit), matching SQL ``regr_*`` semantics.
    """
    if min_points < 2:
        raise ValueError(f"min_points must be >= 2, got {min_points}")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    m = _ols_cols(x, y)
    agg = df.groupBy(*(group_cols or [])).agg(
        m["n"].alias("_n"),
        m["sx"].alias("_sx"),
        m["sy"].alias("_sy"),
        m["sxy"].alias("_sxy"),
        m["sxx"].alias("_sxx"),
        m["syy"].alias("_syy"),
    )
    n = F.col("_n")
    # co-moments around the mean (numerically the standard two-pass
    # identity; fine at double precision for analytics use)
    ssxx = F.col("_sxx") - F.col("_sx") * F.col("_sx") / n
    ssyy = F.col("_syy") - F.col("_sy") * F.col("_sy") / n
    ssxy = F.col("_sxy") - F.col("_sx") * F.col("_sy") / n
    ok = (n >= min_points) & (ssxx > 0)
    slope = F.when(ok, ssxy / ssxx)
    intercept = F.when(
        ok, (F.col("_sy") - slope * F.col("_sx")) / n
    )
    # r² = ssxy² / (ssxx·ssyy); constant-y fits give NULL (0/0), the
    # regr_r2 convention for zero y-variance is 1.0 when the fit is
    # exact — follow SQL: ssyy = 0 => r2 = 1
    r2 = F.when(ok & (ssyy > 0), ssxy * ssxy / (ssxx * ssyy)).when(
        ok & (ssyy <= 0), F.lit(1.0)
    )
    return agg.select(
        *(group_cols or []),
        n.cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def correlation_pairs(
    df: DataFrame,
    cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Pearson correlation for every unordered column pair:
    ``(group..., col_a, col_b, n, corr)`` — one data pass, pairwise
    null deletion per pair, NULL corr when either side is constant
    or fewer than 2 complete pairs survive.
    """
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError(f"columns must be distinct, got {cols}")
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]
    ]
    aggs = []
    for a, b in pairs:
        m = _ols_cols(
            F.col(a).cast("double"), F.col(b).cast("double")
        )
        for k, c in m.items():
            aggs.append(c.alias(f"_{k}_{a}_{b}"))
    agg = df.groupBy(*(group_cols or [])).agg(*aggs)
    rows = []
    for a, b in pairs:
        n = F.col(f"_n_{a}_{b}")
        sx, sy = F.col(f"_sx_{a}_{b}"), F.col(f"_sy_{a}_{b}")
        sxy = F.col(f"_sxy_{a}_{b}")
        sxx, syy = F.col(f"_sxx_{a}_{b}"), F.col(f"_syy_{a}_{b}")
        ssxx = sxx - sx * sx / n
        ssyy = syy - sy * sy / n
        ssxy = sxy - sx * sy / n
        ok = (n >= 2) & (ssxx > 0) & (ssyy > 0)
        rows.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                n.cast("long").alias("n"),
                F.when(ok, ssxy / F.sqrt(ssxx * ssyy)).alias(
                    "corr"
                ),
            )
        )
    return agg.select(
        *(group_cols or []),
        F.explode(F.array(*rows)).alias("_p"),
    ).select(
        *(group_cols or []),
        "_p.col_a",
        "_p.col_b",
        "_p.n",
        "_p.corr",
    )

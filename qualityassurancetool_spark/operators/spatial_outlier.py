"""Rolling-median spatial outlier (reference W5:
``get_bool_spacial_outlier_compared_to_median(df, max_dx_dt, time_window)``,
call ``src/main.py:612-630``; tests ``tests/test_qc.py:263-392``;
``README.adoc:231-239``).

Each fix is compared against the (exact) median latitude/longitude of the
fixes inside a centered time window around it; a fix farther than the
window's allowed travel distance (``max_dx_dt × window``) from that median
is an outlier.

Exactness: the reference uses pandas' exact ``median()``.  Spark's
``percentile(col, 0.5)`` window aggregate is exact (sorts the frame) and
interpolates the even case exactly like pandas/DuckDB — so ``exact=True``
(default) uses it; ``exact=False`` switches to ``percentile_approx`` for a
cheaper plan when windows are huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import QualityFlags, flag_from_bool, flag_merge
from qualityassurancetool_spark.functions.geo import haversine_m
from qualityassurancetool_spark.functions.timeutils import (
    epoch_micros,
    parse_timedelta_seconds,
    timedelta_micros,
)


def with_median_track(
    df: DataFrame,
    time_window: str | float = "10min",
    lat_col: str = "lat",
    lon_col: str = "long",
    ts_col: str = "phenomenon_time",
    partition_cols: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Add ``median_lat``/``median_long`` over the centered time window."""
    half_us = timedelta_micros(time_window) // 2
    parts = partition_cols or []
    order = epoch_micros(ts_col)
    w = (
        (Window.partitionBy(*parts) if parts else Window.partitionBy())
        .orderBy(order)
        .rangeBetween(-half_us, half_us)
    )
    if exact:
        med_lat = F.percentile(F.col(lat_col), F.lit(0.5)).over(w)
        med_lon = F.percentile(F.col(lon_col), F.lit(0.5)).over(w)
    else:
        med_lat = F.percentile_approx(F.col(lat_col), F.lit(0.5)).over(w)
        med_lon = F.percentile_approx(F.col(lon_col), F.lit(0.5)).over(w)
    # "no timestamp, no window": NULL order keys would land in Spark's
    # all-NULLs peer frame; mask so both strategies (plain window and
    # median_track_bucketed) agree that null-ts rows get NULL medians
    has_ts = F.col(ts_col).isNotNull()
    # independent columns: one withColumns = one plan-analysis pass
    return df.withColumns(
        {
            "median_lat": F.when(has_ts, med_lat),
            "median_long": F.when(has_ts, med_lon),
        }
    )


def apply_spatial_outlier_check(
    df: DataFrame,
    max_dx_dt: float,
    time_window: str | float = "10min",
    lat_col: str = "lat",
    lon_col: str = "long",
    ts_col: str = "phenomenon_time",
    partition_cols: list[str] | None = None,
    flag_col: str = "qc_flag",
    exact: bool = True,
    strategy: str = "window",
    threshold_mode: str = "nominal",
) -> DataFrame:
    """Flag fixes farther than the allowed travel distance from the
    windowed median position (the reference's outlier test; ``max_dx_dt``
    is documented as "the maximal velocity of the vessel",
    ``README.adoc:303``, ``conf/config.yaml:87-88``).

    ``threshold_mode`` picks how the allowed distance is derived:

    - ``"nominal"`` — ``max_dx_dt × time_window`` seconds: the window's
      nominal travel budget.  Dense tracks (production: fixes every few
      seconds, 10-min window) make the actual window span ≈ the nominal
      one, so both modes coincide there.
    - ``"span"`` — ``max_dx_dt × (max(ts) − min(ts))`` *inside* each fix's
      window: the travel budget of the data actually present.  This is the
      semantics the reference's own parametrized expectations pin
      (``tests/test_qc.py:263-392``: with ``max_dx_dt=300``,
      ``time_window="5min"`` and a 4-second track, 0.1°-offset fixes
      (~10.1 km from the median) MUST flag while base fixes ≤843 m must
      not — so the threshold lies in (843 m, 10.1 km); the nominal budget
      (90 km) is outside that interval, the span budget (1.2 km) inside).
      Replayed verbatim in ``tests/test_reference_goldens.py``.

    ``strategy="bucketed"`` computes the identical centered-median via
    the streams×buckets halo twin
    (:func:`partitioned_windows.median_track_bucketed`) — the scale path
    when ``partition_cols`` has low cardinality (a handful of tracked
    platforms), where the plain window caps parallelism at n_partitions.
    """
    window_s = parse_timedelta_seconds(time_window)
    max_dist_m = F.lit(max_dx_dt * window_s)
    if threshold_mode == "span":
        half_us = int(round(window_s * 1_000_000)) // 2
        parts = partition_cols or []
        if strategy == "bucketed":
            # the span must scale the same way the median does: a plain
            # centered window here would reintroduce the single-/few-
            # partition bottleneck bucketed was chosen to avoid
            from qualityassurancetool_spark.operators.partitioned_windows import (  # noqa: E501
                bucketed_time_rolling,
            )

            df = bucketed_time_rolling(
                df.withColumn("_span_us", epoch_micros(ts_col)),
                {
                    "_span_min": ("_span_us", "min"),
                    "_span_max": ("_span_us", "max"),
                },
                partition_cols=parts,
                ts_col=ts_col,
                before=half_us / 1e6,
                after=half_us / 1e6,
            ).drop("_span_us")
            span_s = (F.col("_span_max") - F.col("_span_min")) / 1e6
        else:
            order = epoch_micros(ts_col)
            w_span = (
                (
                    Window.partitionBy(*parts)
                    if parts
                    else Window.partitionBy()
                )
                .orderBy(order)
                .rangeBetween(-half_us, half_us)
            )
            span_s = (
                F.max(order).over(w_span) - F.min(order).over(w_span)
            ) / 1e6
        max_dist_m = F.lit(max_dx_dt) * span_s
    elif threshold_mode != "nominal":
        raise ValueError(f"unknown threshold_mode {threshold_mode!r} (nominal|span)")
    if strategy == "bucketed":
        from qualityassurancetool_spark.operators.partitioned_windows import (
            median_track_bucketed,
        )

        df = median_track_bucketed(
            df, time_window, lat_col, lon_col, ts_col, partition_cols
        )
    elif strategy == "window":
        df = with_median_track(
            df, time_window, lat_col, lon_col, ts_col, partition_cols, exact
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r} (window|bucketed)")
    dist = haversine_m(
        F.col("median_lat"),
        F.col("median_long"),
        F.col(lat_col),
        F.col(lon_col),
    )
    # the flag reads the distance EXPRESSION (not the just-added column)
    # so both columns land in one withColumns = one analysis pass; runtime
    # subexpression elimination dedups the doubled haversine
    new_flag = flag_from_bool(
        dist > max_dist_m,
        flag_on_true=QualityFlags.BAD,
        flag_on_false=QualityFlags.NO_QUALITY_CONTROL,
    )
    df = df.withColumns(
        {
            "dist_to_median_m": dist,
            flag_col: flag_merge(F.col(flag_col), new_flag),
        }
    )
    if threshold_mode == "span" and strategy == "bucketed":
        # the only branch that materialized the helper columns; an
        # unconditional drop was a wasted analysis pass otherwise
        df = df.drop("_span_min", "_span_max")
    return df

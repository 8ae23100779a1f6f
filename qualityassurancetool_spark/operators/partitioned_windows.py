"""Bucketed-overlap (halo) scale path for rolling time-range computations.

The pure-Window implementations (``zscore.calc_zscore``,
``spatial_outlier.with_median_track``) use
``Window.partitionBy(stream).orderBy(ts).rangeBetween(...)`` — correct, but
parallelism is capped at the number of streams.  The reference operates on
~14-60 streams (``/root/reference/conf/config.yaml:56-69``); on a
1000-executor cluster against 100 TB, one task per stream is the
bottleneck, and a single hot stream (a high-rate sensor) is a straggler no
matter how many executors exist.

This module re-expresses a rolling time-range aggregation as a
**bucketed-overlap job**: time is cut into fixed buckets; every row is
assigned to its native bucket and *replicated* into the neighboring buckets
whose native rows need it as window context (the "halo", bounded by the
window width).  Each (stream, bucket) group is then computed independently
— parallelism = streams x buckets, arbitrarily larger than streams — and
only native rows are emitted, so results are exactly those of the global
window.  Replication overhead is (before+after)/bucket_width, e.g. 25 % at
the default bucket = 4x window.

Inside a group the per-row window aggregate is computed with numpy
``searchsorted`` over the sorted group (windows here hold ~10^2 rows —
reference sampling is ~1 obs/3 s and windows are minutes:
``BASELINE.md``), via an Arrow-batched ``applyInPandas``.

Semantics pinned to the Window implementations: trailing windows are
closed-both-ends ``[t-before, t]`` like ``rangeBetween(-Δ, 0)``; stddev is
sample (ddof=1); median interpolates (numpy/pandas/Spark ``percentile``
agree).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qualityassurancetool_spark.functions.timeutils import (
    epoch_micros,
    parse_timedelta_seconds,
)

_STATS = ("mean", "std", "median", "count")


def bucketed_time_rolling(
    df: DataFrame,
    specs: dict[str, tuple[str, str]],
    partition_cols: Iterable[str] = ("datastream_id",),
    ts_col: str = "phenomenon_time",
    before: str | float = "60min",
    after: str | float = 0.0,
    bucket: str | float | None = None,
    strategy: str = "window",
) -> DataFrame:
    """Rolling time-range stats with streams x buckets parallelism.

    ``specs`` maps output column -> (source column, stat) with stat one of
    ``mean | std | median | count``.  Window per row is
    ``[t - before, t + after]`` closed on both ends.  ``bucket`` defaults
    to ``4 * (before + after)``.  Returns the input rows (exactly once)
    plus the requested stat columns, matching the equivalent
    ``Window...rangeBetween`` expression row-for-row.

    ``strategy="window"`` (default) computes each (stream, bucket) group
    with an ordinary JVM RANGE-frame Window over the halo-exploded frame
    — the group key gains ``_bucket``, so parallelism is streams×buckets
    while the per-row aggregate expressions stay identical to the
    pure-Window twin; no Python/Arrow stage exists at all.
    ``strategy="pandas"`` uses the Arrow-batched numpy/pandas kernel —
    kept because Spark recomputes bounded sliding frames per row
    (O(rows×window_rows) inside a group), while the pandas C rolling
    engine is O(rows) for mean/std: with very dense windows (≫10³ rows
    per window) the kernel can win despite the Arrow boundary.  Measured
    warm at sf0.1 (windows ≈ 10²ish rows): zscore 0.4 s (window) vs
    0.9 s (pandas); centered median 0.3 s vs 2.1 s (the centered-median
    kernel falls off the C rolling engine onto a per-row numpy loop) —
    hence the JVM default, with exact output parity tested between
    strategies.
    """
    if strategy not in ("window", "pandas"):
        raise ValueError(f"unknown strategy {strategy!r}")
    for out, (_, stat) in specs.items():
        if stat not in _STATS:
            raise ValueError(f"{out}: unknown stat {stat!r}")
    parts = list(partition_cols)
    before_us = int(parse_timedelta_seconds(before) * 1_000_000)
    after_us = int(parse_timedelta_seconds(after) * 1_000_000)
    span_us = before_us + after_us
    if span_us <= 0:
        raise ValueError("window must have positive width")
    bucket_us = (
        int(parse_timedelta_seconds(bucket) * 1_000_000)
        if bucket is not None
        else 4 * span_us
    )

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(
                out, T.LongType() if spec[1] == "count" else T.DoubleType(), True
            )
            for out, spec in specs.items()
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    t = epoch_micros(ts_col)
    # NULL-timestamp rows would vanish in the bucket explode (NULL
    # sequence → zero rows) — the plain-Window twin KEEPS them with
    # null stats, so parity requires routing them around the explode
    # and unioning back at the end (review finding)
    null_ts = df.where(F.col(ts_col).isNull()).select(
        "*",
        *[
            F.lit(None)
            .cast("long" if spec[1] == "count" else "double")
            .alias(out)
            for out, spec in specs.items()
        ],
    )
    df = df.where(F.col(ts_col).isNotNull())
    # input row at time t is context for native rows in [t-after, t+before]
    b_lo = F.floor((t - F.lit(after_us)) / F.lit(bucket_us))
    b_hi = F.floor((t + F.lit(before_us)) / F.lit(bucket_us))
    exploded = (
        df.withColumn("_t_us", t)
        .withColumn("_bucket", F.explode(F.sequence(b_lo, b_hi)))
        .withColumn(
            "_native", F.floor(F.col("_t_us") / F.lit(bucket_us)) == F.col("_bucket")
        )
    )
    # explicit repartition on the group keys: the downstream exchange
    # would be AQE-coalesced by (small) shuffle bytes, capping kernel
    # parallelism; a user repartition is never coalesced, and both the
    # groupBy and the Window reuse its partitioning (no second exchange)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    exploded = exploded.repartition(n_parts, *parts, F.col("_bucket"))

    if strategy == "window":
        from pyspark.sql import Window

        w = (
            Window.partitionBy(*parts, "_bucket")
            .orderBy("_t_us")
            .rangeBetween(-before_us, after_us)
        )
        stat_cols = {}
        for out_col, (src, stat) in specs.items():
            if stat == "count":
                c = F.count(F.lit(1)).over(w).cast("long")
            elif stat == "mean":
                c = F.avg(src).over(w)
            elif stat == "median":
                c = F.percentile(src, F.lit(0.5)).over(w)
            else:
                c = F.stddev_samp(src).over(w)
            stat_cols[out_col] = c
        return (
            exploded.withColumns(stat_cols)
            .where("_native")
            .select(*in_cols, *specs.keys())
            .unionByName(null_ts)
        )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_t_us", kind="mergesort").reset_index(drop=True)
        ts = pdf["_t_us"].to_numpy(dtype=np.int64)
        native = pdf["_native"].to_numpy(dtype=bool)
        nat_ts = ts[native]
        lo = np.searchsorted(ts, nat_ts - before_us, side="left")
        hi = np.searchsorted(ts, nat_ts + after_us, side="right")
        out = pdf.loc[native, in_cols].reset_index(drop=True)
        # trailing windows ([t-Δ, t], after == 0): pandas' C rolling engine
        # with closed='both' matches rangeBetween(-Δ, 0) exactly (the
        # reference itself is pandas rolling) — ~50x the python loop
        rolling = None
        if after_us == 0:
            idx = pd.to_datetime(pdf["_t_us"], unit="us")
            srcs = list(
                dict.fromkeys(s for s, st in specs.values() if st != "count")
            )
            rolling = pdf[srcs].set_axis(idx, axis=0)
        vals_cache: dict[str, np.ndarray] = {}
        for out_col, (src, stat) in specs.items():
            if stat == "count":
                out[out_col] = (hi - lo).astype(np.int64)
                continue
            if rolling is not None:
                r = (
                    rolling[src]
                    .rolling(pd.Timedelta(microseconds=before_us), closed="both")
                )
                series = (
                    r.mean()
                    if stat == "mean"
                    else r.median() if stat == "median" else r.std(ddof=1)
                )
                out[out_col] = series.to_numpy(dtype=np.float64)[native]
                continue
            if src not in vals_cache:
                vals_cache[src] = pdf[src].to_numpy(dtype=np.float64)
            v = vals_cache[src]
            res = np.empty(len(nat_ts), dtype=np.float64)
            for i in range(len(nat_ts)):
                w = v[lo[i] : hi[i]]
                w = w[~np.isnan(w)]
                if stat == "mean":
                    res[i] = w.mean() if len(w) else np.nan
                elif stat == "median":
                    res[i] = np.median(w) if len(w) else np.nan
                else:  # sample std
                    res[i] = w.std(ddof=1) if len(w) > 1 else np.nan
            out[out_col] = res
        return out

    return (
        exploded.groupBy(*parts, "_bucket")
        .applyInPandas(compute, schema=out_schema)
        .unionByName(null_ts)
    )


def calc_zscore_bucketed(
    df: DataFrame,
    value_col: str = "result",
    ts_col: str = "phenomenon_time",
    group_col: str | list[str] = "datastream_id",
    rolling_time_window: str | float = "60min",
    out_col: str = "zscore",
    bucket: str | float | None = None,
    strategy: str = "window",
) -> DataFrame:
    """Scale-path twin of :func:`zscore.calc_zscore` (trailing window,
    sample std) — identical output, streams x buckets parallelism."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    with_stats = bucketed_time_rolling(
        df,
        specs={"_mu": (value_col, "mean"), "_sigma": (value_col, "std")},
        partition_cols=groups,
        ts_col=ts_col,
        before=rolling_time_window,
        after=0.0,
        bucket=bucket,
        strategy=strategy,
    )
    z = F.when(
        F.col("_sigma") > 0, (F.col(value_col) - F.col("_mu")) / F.col("_sigma")
    )
    return with_stats.withColumn(out_col, z).drop("_mu", "_sigma")


def median_track_bucketed(
    df: DataFrame,
    time_window: str | float = "10min",
    lat_col: str = "lat",
    lon_col: str = "long",
    ts_col: str = "phenomenon_time",
    partition_cols: list[str] | None = None,
    bucket: str | float | None = None,
    strategy: str = "window",
) -> DataFrame:
    """Scale-path twin of :func:`spatial_outlier.with_median_track`
    (centered exact-median window)."""
    half = parse_timedelta_seconds(time_window) / 2.0
    return bucketed_time_rolling(
        df,
        specs={
            "median_lat": (lat_col, "median"),
            "median_long": (lon_col, "median"),
        },
        partition_cols=partition_cols or [],
        ts_col=ts_col,
        before=half,
        after=half,
        bucket=bucket,
        strategy=strategy,
    )

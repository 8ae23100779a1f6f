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

from qualityassurancetool_spark.flags import QualityFlags, flag_from_bool
from qualityassurancetool_spark.functions.timeutils import (
    epoch_micros,
    parse_timedelta_seconds,
    timedelta_micros,
)

_STATS = ("mean", "std", "std_pop", "median", "count", "min", "max")


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
    ``mean | std | median | count | min | max``.  Window per row is
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
    # round, don't truncate: ulp noise in float-seconds specs (e.g. the
    # reference frame's -1 µs upper bound) must not collapse to 0
    before_us = timedelta_micros(before)
    after_us = timedelta_micros(after)
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
    # input row at time t is context for native rows in [t-after, t+before];
    # a NEGATIVE after (strict-past frames, e.g. the z-score reference
    # convention's [t-Δ, t-1µs]) can push b_lo past the row's OWN bucket
    # at bucket-boundary times — least() keeps the native copy emitted
    own = F.floor(t / F.lit(bucket_us))
    b_lo = F.least(F.floor((t - F.lit(after_us)) / F.lit(bucket_us)), own)
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
            elif stat == "min":
                c = F.min(F.col(src).cast("double")).over(w)
            elif stat == "max":
                c = F.max(F.col(src).cast("double")).over(w)
            elif stat == "std_pop":
                c = F.sqrt(F.var_pop(src).over(w))
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
                    else r.median()
                    if stat == "median"
                    else r.min()
                    if stat == "min"
                    else r.max()
                    if stat == "max"
                    else r.std(ddof=0)
                    if stat == "std_pop"
                    else r.std(ddof=1)
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
                elif stat == "min":
                    res[i] = w.min() if len(w) else np.nan
                elif stat == "max":
                    res[i] = w.max() if len(w) else np.nan
                elif stat == "std_pop":
                    res[i] = w.std(ddof=0) if len(w) else np.nan
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
    frame: str = "trailing",
) -> DataFrame:
    """Scale-path twin of :func:`zscore.calc_zscore` — identical output,
    streams x buckets parallelism.  ``frame`` picks the same conventions
    as the plain twin: ``"trailing"`` (pandas rolling, sample std) or
    ``"reference"`` (strict-past ``[t−Δ, t)`` stats lagged one row,
    population σ, σ=0 movement → ±∞ — the golden-replay convention).

    Reference-frame decomposition: the strict-past stats are ONE
    bucketed rolling pass (``after = −1 µs``); the lag-one-row is the
    :func:`_bucket_boundary_halos` primitive (previous bucket's last
    row carries its stats in).  Rows with NULL timestamps score NULL
    and are routed around both passes, and — unlike the plain twin,
    where a NULL-ts row silently participates in its neighbor's lag
    chain — they are also excluded from the lag here (the cleaner
    convention; parity is pinned on NULL-ts-free data, the only kind
    the golden fixtures contain)."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    if frame == "reference":
        from pyspark.sql import Window

        if strategy != "window":
            raise ValueError(
                "frame='reference' supports the window strategy only"
            )
        delta_us = timedelta_micros(rolling_time_window)
        if delta_us <= 1:
            raise ValueError(
                f"window {rolling_time_window!r} too small for the "
                "strict-past reference frame"
            )
        with_stats = bucketed_time_rolling(
            df,
            specs={
                "_mu_p": (value_col, "mean"),
                "_sigma_p": (value_col, "std_pop"),
            },
            partition_cols=groups,
            ts_col=ts_col,
            before=rolling_time_window,
            after=-1.0 / 1_000_000.0,  # right bound t − 1 µs: strict past
            bucket=bucket,
            strategy="window",
        )
        bucket_us = (
            int(round(parse_timedelta_seconds(bucket) * 1_000_000))
            if bucket is not None
            else 4 * delta_us
        )
        in_cols = [f.name for f in df.schema.fields]
        null_ts = with_stats.where(F.col(ts_col).isNull()).select(
            *in_cols, F.lit(None).cast("double").alias(out_col)
        )
        rows = (
            with_stats.where(F.col(ts_col).isNotNull())
            .withColumn("_t_us", epoch_micros(ts_col))
            .withColumn(
                "_bucket", F.floor(F.col("_t_us") / F.lit(bucket_us))
            )
        )
        halos = _bucket_boundary_halos(
            rows, groups, [], carry_cols=["_mu_p", "_sigma_p"]
        )

        def prev_halo_rows() -> DataFrame:
            h = halos.where(F.col("_prev").isNotNull())
            sel = []
            for f in rows.schema.fields:
                name = f.name
                if name in ("_t_us", "_mu_p", "_sigma_p"):
                    sel.append(F.col("_prev")[name].alias(name))
                elif name in groups or name == "_bucket":
                    sel.append(F.col(name))
                else:
                    sel.append(F.lit(None).cast(f.dataType).alias(name))
            return h.select(*sel, F.lit(False).alias("_native"))

        exploded = rows.withColumn("_native", F.lit(True)).unionByName(
            prev_halo_rows()
        )
        n_parts = df.sparkSession.sparkContext.defaultParallelism
        exploded = exploded.repartition(n_parts, *groups, F.col("_bucket"))
        w = Window.partitionBy(*groups, "_bucket").orderBy("_t_us")
        v = F.col(value_col)
        mu = F.lag("_mu_p").over(w)
        sigma = F.lag("_sigma_p").over(w)
        # σ=0 epsilon identical to the plain twin (zscore.calc_zscore)
        differs = F.abs(v - mu) > F.lit(1e-9) * F.greatest(
            F.abs(v), F.abs(mu), F.lit(1e-30)
        )
        z = F.when(sigma > 0, (v - mu) / sigma).when(
            (sigma == 0) & differs,
            F.signum(v - mu) * F.lit(float("inf")),
        )
        return (
            exploded.withColumn(out_col, z)
            .where("_native")
            .select(*in_cols, out_col)
            .unionByName(null_ts)
        )
    if frame != "trailing":
        raise ValueError(f"unknown frame {frame!r} (trailing|reference)")
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


def _bucket_boundary_halos(
    rows: DataFrame,
    groups: list[str],
    order_extra: list[str],
    carry_cols: list[str],
):
    """Per (stream, bucket): the previous non-empty bucket's LAST row and
    the next non-empty bucket's FIRST row (ordered by ``_t_us`` +
    ``order_extra``), as structs carrying ``_t_us`` + ``carry_cols``.

    This is the exact-neighbor primitive for lag/lead-shaped operators
    (gradient, diff/dt, gaps-and-islands): unlike the time-halo explode
    in :func:`bucketed_time_rolling`, a row's ordinal neighbor can be
    arbitrarily far in time, so the halo is found by aggregating each
    bucket to its first/last row (streams × buckets rows — tiny) and
    running ONE lag/lead window over that summary frame per stream.
    That window is per-stream again, but over n_buckets rows, so it is
    never the wall the row-level per-stream window is.
    """
    ord_cols = [F.col("_t_us")] + [F.col(c) for c in order_extra]
    ord_struct = F.struct(*ord_cols)
    pay_names = list(dict.fromkeys(["_t_us", *carry_cols, *order_extra]))
    pay = F.struct(*[F.col(c) for c in pay_names])
    summaries = rows.groupBy(*groups, "_bucket").agg(
        F.min_by(pay, ord_struct).alias("_first"),
        F.max_by(pay, ord_struct).alias("_last"),
    )
    from pyspark.sql import Window

    w_b = Window.partitionBy(*groups).orderBy("_bucket")
    return summaries.select(
        *groups,
        "_bucket",
        F.lag("_last").over(w_b).alias("_prev"),
        F.lead("_first").over(w_b).alias("_next"),
    )


def calc_gradient_bucketed(
    df: DataFrame,
    value_col: str = "result",
    ts_col: str = "phenomenon_time",
    group_col: str | list[str] = "datastream_id",
    out_col: str = "gradient",
    order_extra: list[str] | None = None,
    bucket: str | float = "1d",
) -> DataFrame:
    """Scale-path twin of :func:`gradient.calc_gradient` (np.gradient
    parity) — identical output, streams × buckets parallelism.

    The gradient needs each row's ordinal prev/next neighbor, which can
    be any time-gap away, so the halo is the neighbor-bucket boundary
    row (see :func:`_bucket_boundary_halos`) rather than a time-width
    replication.  Each (stream, bucket) group then runs the ordinary
    JVM lag/lead window with at most two non-native rows appended; only
    native rows are emitted.  NULL-timestamp rows get a NULL gradient
    in BOTH twins ("no timestamp, no window"): in the plain path they
    sort into the nulls-first head where every µs difference is NULL,
    and real rows treat them as absent — replicated here by routing
    them around the bucketing.
    """
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    order_extra = list(order_extra or [])
    bucket_us = int(parse_timedelta_seconds(bucket) * 1_000_000)
    in_cols = [f.name for f in df.schema.fields]

    null_ts = df.where(F.col(ts_col).isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    rows = (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("_t_us", epoch_micros(ts_col))
        .withColumn("_bucket", F.floor(F.col("_t_us") / F.lit(bucket_us)))
    )
    halos = _bucket_boundary_halos(
        rows, groups, order_extra, carry_cols=[value_col]
    )

    def halo_rows(side: str) -> DataFrame:
        h = halos.where(F.col(side).isNotNull())
        sel = []
        for f in rows.schema.fields:
            name = f.name
            if name in ("_t_us",) or name == value_col or name in order_extra:
                sel.append(F.col(side)[name].alias(name))
            elif name in groups or name == "_bucket":
                sel.append(F.col(name))
            else:
                sel.append(F.lit(None).cast(f.dataType).alias(name))
        return h.select(*sel, F.lit(False).alias("_native"))

    native = rows.withColumn("_native", F.lit(True))
    exploded = native.unionByName(halo_rows("_prev")).unionByName(
        halo_rows("_next")
    )
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    exploded = exploded.repartition(n_parts, *groups, F.col("_bucket"))

    from pyspark.sql import Window

    from qualityassurancetool_spark.operators.gradient import gradient_expr

    w = Window.partitionBy(*groups, "_bucket").orderBy("_t_us", *order_extra)
    return (
        exploded.withColumn(out_col, gradient_expr(w, value_col, F.col("_t_us")))
        .where("_native")
        .select(*in_cols, out_col)
        .unionByName(null_ts)
    )


def apply_stabilization_bucketed(
    df: DataFrame,
    value_col: str = "result",
    ts_col: str = "phenomenon_time",
    group_cols: list[str] | None = None,
    min_col: str = "qc_range_min",
    max_col: str = "qc_range_max",
    max_allowed_downtime_col: str = "max_allowed_downtime",
    dt_stabilization_col: str = "dt_stabilization",
    flag_col: str = "stabilization_flag",
    keep_intermediate: bool = True,
    bucket: str | float = "1d",
) -> DataFrame:
    """Scale-path twin of :func:`stabilization.apply_stabilization`
    (W1–W4: diff / cumsum / conditional ffill / gaps-and-islands) with
    streams × buckets parallelism.

    The chain is a *prefix scan*, not a bounded window, so the
    decomposition is the classic two-phase scan: each (stream, bucket)
    computes LOCAL running values; per-bucket summaries (a streams ×
    buckets frame — tiny) get exclusive-prefix carries with one window
    over the summary frame; carries join back and seed the local pass.
    The two conditional forward-fills (``time_down``'s last-within
    anchor and ``time_up_since``'s last-exceedance anchor) carry as
    "last non-null anchor value per bucket" + an ffill over the summary
    frame; ``time_up_since``'s anchor depends on ``time_down``, so it
    needs a second (equally tiny) summary round.

    Exactness caveat: ``cumsum`` adds the same per-row ``dt`` doubles
    in a different association order than the sequential window, so
    values can differ from the plain path by a few ulps of the running
    total (flags are threshold comparisons far from knife edges; the
    parity test pins agreement to 1e-6 s absolute).
    """
    from pyspark.sql import Window

    groups = group_cols or ["datastream_id"]
    bucket_us = int(parse_timedelta_seconds(bucket) * 1_000_000)
    in_cols = [f.name for f in df.schema.fields]

    within_expr = (F.col(value_col) > F.col(min_col)) & (
        F.col(value_col) < F.col(max_col)
    )
    null_ts = df.where(F.col(ts_col).isNull()).withColumns(
        {
            "within_limits": within_expr,
            "dt": F.lit(None).cast("double"),
            "cumsum": F.lit(None).cast("double"),
            "time_down": F.lit(None).cast("double"),
            "time_up_since": F.lit(None).cast("double"),
            "block_id": F.lit(None).cast("long"),
            "max_downtime": F.lit(None).cast("double"),
            flag_col: F.lit(None).cast("tinyint"),
        }
    )
    rows = (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("_t_us", epoch_micros(ts_col))
        .withColumn("_bucket", F.floor(F.col("_t_us") / F.lit(bucket_us)))
        .withColumn("within_limits", within_expr)
    )
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    rows = rows.repartition(n_parts, *groups, F.col("_bucket"))

    # ---- boundary carries: prev bucket's last (t, within) per bucket ----
    halos = _bucket_boundary_halos(
        rows, groups, [], carry_cols=["within_limits"]
    ).select(
        *groups,
        "_bucket",
        F.col("_prev")["_t_us"].alias("_prev_t_us"),
        F.col("_prev")["within_limits"].alias("_prev_within"),
    )
    rows = rows.join(halos, [*groups, "_bucket"], "left")

    # ---- local pass 1: dt, local cumsum, local block counter ----
    w_loc = Window.partitionBy(*groups, "_bucket").orderBy("_t_us")
    w_run = w_loc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eff_prev_t = F.coalesce(F.lag("_t_us").over(w_loc), F.col("_prev_t_us"))
    eff_prev_within = F.coalesce(
        F.lag("within_limits").over(w_loc), F.col("_prev_within")
    )
    rows = rows.withColumns(
        {
            "dt": F.coalesce(
                (F.col("_t_us") - eff_prev_t) / F.lit(1_000_000.0),
                F.lit(0.0),
            ),
            # global first row of the stream: no prev bucket, no local lag
            "_is_first": F.col("_prev_t_us").isNull()
            & (F.row_number().over(w_loc) == 1),
            "_changed": F.when(
                eff_prev_within.isNull()
                | (F.col("within_limits") != eff_prev_within),
                F.lit(1),
            ).otherwise(F.lit(0)),
        }
    )
    rows = rows.withColumns(
        {
            "_local_cum": F.sum("dt").over(w_run),
            "_local_blk": F.sum("_changed").over(w_run),
        }
    )

    # ---- summary round 1: exclusive carries over the bucket frame ----
    # tmp_down anchor rows are within-rows plus the global first row; at
    # the global first row cumsum is exactly 0, so the reference's
    # seeded 0 equals its cumsum and one marker covers both cases
    m_down = F.col("within_limits") | F.col("_is_first")
    sum1 = rows.groupBy(*groups, "_bucket").agg(
        F.sum("dt").alias("_tot_dt"),
        F.sum("_changed").alias("_tot_chg"),
        F.max(
            F.when(m_down, F.struct(F.col("_t_us"), F.col("_local_cum")))
        )["_local_cum"].alias("_last_down_localcum"),
    )
    w_b = Window.partitionBy(*groups).orderBy("_bucket")
    w_b_excl = w_b.rowsBetween(Window.unboundedPreceding, -1)
    sum1 = sum1.withColumns(
        {
            "_carry_cum": F.coalesce(F.sum("_tot_dt").over(w_b_excl), F.lit(0.0)),
            "_carry_blk": F.coalesce(
                F.sum("_tot_chg").over(w_b_excl), F.lit(0)
            ).cast("long"),
        }
    )
    # last tmp_down VALUE in each bucket is carry + local (global cumsum);
    # ffill it across buckets to seed later buckets' time_down
    sum1 = sum1.withColumn(
        "_ld", F.col("_carry_cum") + F.col("_last_down_localcum")
    ).withColumn(
        "_carry_down", F.last("_ld", ignorenulls=True).over(w_b_excl)
    )
    rows = rows.join(
        sum1.select(
            *groups, "_bucket", "_carry_cum", "_carry_blk", "_carry_down"
        ),
        [*groups, "_bucket"],
        "left",
    )

    # ---- local pass 2: global cumsum, time_down, block_id ----
    rows = rows.withColumns(
        {
            "cumsum": F.col("_carry_cum") + F.col("_local_cum"),
            "block_id": (F.col("_carry_blk") + F.col("_local_blk")).cast(
                "long"
            ),
        }
    )
    tmp_down = F.when(m_down, F.col("cumsum"))
    rows = rows.withColumn(
        "time_down",
        F.col("cumsum")
        - F.coalesce(
            F.last(tmp_down, ignorenulls=True).over(w_run),
            F.col("_carry_down"),
        ),
    )

    # ---- summary round 2: time_up anchor carry (depends on time_down) ----
    m_up = F.col("_is_first") | (
        F.col("time_down") > F.col(max_allowed_downtime_col)
    )
    tmp_up = F.when(m_up, F.col("cumsum"))
    rows = rows.withColumn("_tmp_up", tmp_up)
    sum2 = (
        rows.groupBy(*groups, "_bucket")
        .agg(
            F.max(
                F.when(
                    F.col("_tmp_up").isNotNull(),
                    F.struct(F.col("_t_us"), F.col("_tmp_up")),
                )
            )["_tmp_up"].alias("_lu")
        )
        .withColumn(
            "_carry_up", F.last("_lu", ignorenulls=True).over(w_b_excl)
        )
    )
    rows = rows.join(
        sum2.select(*groups, "_bucket", "_carry_up"),
        [*groups, "_bucket"],
        "left",
    )
    rows = rows.withColumn(
        "time_up_since",
        F.col("cumsum")
        - F.coalesce(
            F.last("_tmp_up", ignorenulls=True).over(w_run),
            F.col("_carry_up"),
        ),
    )

    # ---- per-block max downtime + flag (block_id is global now) ----
    w_block = Window.partitionBy(*groups, "block_id")
    rows = rows.withColumns(
        {
            "max_downtime": F.when(
                F.col("within_limits"), F.lit(0.0)
            ).otherwise(F.max("time_down").over(w_block)),
            flag_col: flag_from_bool(
                F.col("time_up_since") < F.col(dt_stabilization_col),
                flag_on_true=QualityFlags.BAD,
                flag_on_false=QualityFlags.NO_QUALITY_CONTROL,
            ),
        }
    )
    derived = [
        "within_limits",
        "dt",
        "cumsum",
        "time_down",
        "time_up_since",
        "block_id",
        "max_downtime",
        flag_col,
    ]
    out = rows.select(*in_cols, *derived).unionByName(null_ts)
    if not keep_intermediate:
        out = out.drop(*derived[:-1])
    return out


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
    # µs-integral half-width so the rolling pass recovers EXACTLY the
    # plain twin's timedelta_micros(w) // 2 bound (an odd-µs window
    # halved as float seconds would round up where the plain twin
    # floors — review finding, round 8)
    half = (timedelta_micros(time_window) // 2) / 1e6
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

"""Time-series resampling: fixed-frequency grid + gap interpolation.

The missing half of the reference's reshaping surface: ``pivot_export``
aligns existing observations and ``downsample_transfer`` thins them
(reference ``src/aums_data_request.py`` best-per-second export), but
nothing UPSAMPLES — regularizing irregular sensor streams onto a fixed
grid (the input shape models, rollups and cross-stream joins want).
This operator fills the seam: per stream, generate the tick grid
spanning the stream's observed range and value each tick from its
neighbors.

Methods (per tick ``t`` with previous observation ``(pt, pv)`` and
next ``(nt, nv)``):

- ``linear`` — ``pv + (nv−pv)·(t−pt)/(nt−pt)``; exact hits return the
  observed value; ticks before the first / after the last observation
  are NULL (no extrapolation).
- ``ffill`` — ``pv``; NULL before the first observation.
- ``nearest`` — the closer of ``pv``/``nv`` (ties toward the earlier
  observation, matching the as-of join's tie discipline).

Spark shape, all declarative, ONE window pass: the grid is
``explode(sequence(ceil_to_grid(min_ts), max_ts, step))`` from a
per-stream min/max aggregate (grid rows ∝ span/freq, generated
map-side, never shuffled as input rows); grid and observation rows
UNION once, and a single ordered window per stream computes
last/next-non-null value+timestamp (``last(..., ignorenulls)`` over
the growing/shrinking frames).  Scale: the window partitions by
stream — the same low-cardinality consideration as the QC chain
(``window_strategy`` discussion in docs/SCALE.md) applies when
streams ≪ cores.

Cross-engine: ``tools/extra_oracles.py::x_resample`` replicates grid
generation, neighbor windows and the interpolation arithmetic in
DuckDB (values at 6 dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_METHODS = ("linear", "ffill", "nearest")


def resample_interpolate(
    df: DataFrame,
    id_col: str = "datastream_id",
    ts_col: str = "phenomenon_time",
    value_col: str = "result",
    freq_seconds: int = 60,
    method: str = "linear",
) -> DataFrame:
    """Fixed-frequency per-stream grid ``(id_col, grid_ts, value,
    n_src)`` — ``value`` per the chosen method, ``n_src`` the count of
    source observations landing EXACTLY on that tick (0 for filled
    ticks; >1 flags duplicate timestamps — no averaging: among
    exact-duplicate timestamps the LARGEST value wins, a
    deterministic, engine-portable choice)."""
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method}")
    if freq_seconds < 1:
        raise ValueError(f"freq_seconds must be >= 1, got {freq_seconds}")
    step = F.lit(freq_seconds)
    obs = df.select(
        F.col(id_col).alias("_id"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_ts").isNotNull())
    # per-stream span -> tick epochs (grid aligned to epoch 0 so two
    # streams' grids line up for cross-stream joins downstream)
    span = obs.groupBy("_id").agg(
        F.min(F.unix_timestamp("_ts")).alias("_lo"),
        F.max(F.unix_timestamp("_ts")).alias("_hi"),
    )
    # first grid tick at/after lo; a span containing NO tick (single
    # off-grid observation, or all observations inside one inter-tick
    # gap) would make sequence(start > stop) throw — guard it with an
    # empty array (explode drops the stream: zero grid rows, the
    # no-extrapolation contract)
    start = (F.ceil(F.col("_lo") / step) * step).cast("long")
    grid = span.select(
        "_id",
        F.explode(
            F.when(
                start <= F.col("_hi"),
                F.sequence(start, F.col("_hi"), step.cast("long")),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("_epoch"),
    ).select(
        "_id",
        F.col("_epoch"),
        F.timestamp_seconds("_epoch").alias("_ts"),
        F.lit(None).cast("double").alias("_v"),
        F.lit(0).alias("_is_obs"),
    )
    src = obs.select(
        "_id",
        F.unix_timestamp("_ts").alias("_epoch"),
        "_ts",
        "_v",
        F.lit(1).alias("_is_obs"),
    )
    u = grid.unionByName(src)
    # observation rows sort BEFORE the grid tick sharing their epoch
    # (is_obs desc) so an exact hit's "previous observation" is itself;
    # among exact-duplicate timestamps ascending _v makes the LAST
    # (largest) value the window's pick — deterministic and portable.
    #
    # BOTH neighbor lookups run as RUNNING frames (unboundedPreceding →
    # currentRow): Spark evaluates those incrementally (O(rows)), while
    # a [currentRow, unboundedFollowing] frame re-aggregates from
    # scratch per row — O(rows²) per stream, measured 5.7 s → 255 s
    # from 1 M → 10 M rows before this rewrite (round-9 rehearsal).
    # The "next observation" therefore uses the exactly-REVERSED order
    # (desc mirrors asc's null placement), where last(...ignorenulls)
    # over the running frame IS the first following non-null.
    order = [F.col("_epoch"), F.col("_is_obs").desc(), F.col("_v")]
    order_rev = [
        F.col("_epoch").desc(),
        F.col("_is_obs").asc(),
        F.col("_v").desc(),
    ]
    w_prev = (
        Window.partitionBy("_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("_id")
        .orderBy(*order_rev)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_epoch = F.when(F.col("_is_obs") == 1, F.col("_epoch"))
    obs_val = F.when(F.col("_is_obs") == 1, F.col("_v"))
    annotated = u.select(
        "_id",
        "_epoch",
        "_ts",
        "_is_obs",
        F.last(obs_epoch, ignorenulls=True).over(w_prev).alias("_pt"),
        F.last(obs_val, ignorenulls=True).over(w_prev).alias("_pv"),
        F.last(obs_epoch, ignorenulls=True).over(w_next).alias("_nt"),
        F.last(obs_val, ignorenulls=True).over(w_next).alias("_nv"),
    ).where(F.col("_is_obs") == 0)
    exact = F.col("_pt") == F.col("_epoch")
    if method == "linear":
        interp = F.when(exact, F.col("_pv")).otherwise(
            F.when(
                F.col("_pt").isNotNull() & F.col("_nt").isNotNull(),
                F.col("_pv")
                + (F.col("_nv") - F.col("_pv"))
                * (F.col("_epoch") - F.col("_pt")).cast("double")
                / (F.col("_nt") - F.col("_pt")).cast("double"),
            )
        )
    elif method == "ffill":
        interp = F.col("_pv")
    else:  # nearest; tie -> earlier observation
        interp = F.when(exact, F.col("_pv")).otherwise(
            F.when(F.col("_pt").isNull(), F.col("_nv"))
            .when(F.col("_nt").isNull(), F.col("_pv"))
            .when(
                (F.col("_epoch") - F.col("_pt"))
                <= (F.col("_nt") - F.col("_epoch")),
                F.col("_pv"),
            )
            .otherwise(F.col("_nv"))
        )
    dup = src.groupBy("_id", "_epoch").agg(
        F.count(F.lit(1)).cast("int").alias("_n_src")
    )
    return (
        annotated.join(dup, ["_id", "_epoch"], "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_ts").alias("grid_ts"),
            interp.alias("value"),
            F.coalesce(F.col("_n_src"), F.lit(0)).alias("n_src"),
        )
    )

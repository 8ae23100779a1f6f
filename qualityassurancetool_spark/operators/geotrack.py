"""Geodesic track kinematics: velocity & acceleration between consecutive
fixes (reference W8: ``get_dt_velocity_and_acceleration_series`` +
``get_bool_exceed_max_velocity/acceleration``, ``src/main.py:654-710``;
tests ``tests/test_qc.py:395-435``; ``README.adoc:218-229``).

Distance is haversine in pure Column math (geodesic-vs-haversine ≤0.5 % at
track scales, documented in ``functions/geo.py``).  Velocity pairs the
current fix with the previous one over a time-ordered window; acceleration
differences consecutive velocities.  A flagged *pair* marks **both** of its
rows (reference marks ``idx0-1`` and ``idx0`` — ``tests/test_qc.py:429``),
expressed as ``bool | lead(bool)``.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import QualityFlags, flag_from_bool, flag_merge
from qualityassurancetool_spark.functions.geo import geodesic_m
from qualityassurancetool_spark.functions.timeutils import epoch_micros

logger = logging.getLogger(__name__)

# file-count proxy for "non-trivially sized": file-backed frames report
# their scan set via inputFiles(); above this many files a global
# (unpartitioned) window is almost certainly a mistake at scale
_GLOBAL_WINDOW_WARN_FILES = 4


def _warn_if_global_window_on_big_input(df: DataFrame) -> None:
    """``partition_cols=None`` collapses the velocity window to ONE
    sorted partition — correct for the reference's single-ship track,
    a silent single-task sort on a large frame.  Warn when the input
    is visibly file-backed and non-trivial (createDataFrame test
    fixtures report no files and stay quiet)."""
    try:
        nfiles = len(df.inputFiles())
    except Exception:  # non-file-backed / exotic plans: stay quiet
        return
    if nfiles > _GLOBAL_WINDOW_WARN_FILES:
        logger.warning(
            "with_velocity_acceleration: partition_cols=None on an input "
            "backed by %d files — the time window will sort ALL rows in "
            "ONE task (single-partition global sort). Pass a track/vessel "
            "id in partition_cols for anything beyond a single ship's "
            "track.",
            nfiles,
        )


def with_velocity_acceleration(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "long",
    ts_col: str = "phenomenon_time",
    partition_cols: list[str] | None = None,
    order_extra: list[str] | None = None,
    dt_col: str = "dt_s",
    velocity_col: str = "velocity_ms",
    acceleration_col: str = "acceleration_ms2",
    distance: str = "haversine",
) -> DataFrame:
    """Add dt (s), velocity (m/s) and acceleration (m/s²) columns.

    ``partition_cols=None`` means one global track (the reference's single
    ship) — for that case keep an explicit repartition-free window; at scale
    callers should pass a track/vessel id to partition on.

    ``distance`` selects the pair-distance kernel (see
    :func:`functions.geo.geodesic_m`): ``"haversine"`` (default, pure
    Columns, ≤0.5 % spherical error), ``"lambert"`` (WGS-84 correction,
    still pure Columns, <10 m), or ``"exact"`` (Arrow-batched Karney /
    Vincenty UDF — the reference's geopy-geodesic semantics, which the
    shipped ``data_velocity_acc.csv`` fixture pins;
    ``tests/test_qc.py:33-47,395-435``).
    """
    parts = partition_cols or []
    if not parts:
        _warn_if_global_window_on_big_input(df)
    order_cols = [F.col(ts_col)] + [F.col(c) for c in (order_extra or [])]
    w = (
        Window.partitionBy(*parts).orderBy(*order_cols)
        if parts
        else Window.orderBy(*order_cols)
    )
    # exact integer-µs difference, then to seconds (no epoch-double cancellation)
    t_us = epoch_micros(ts_col)
    dt = (t_us - F.lag(t_us).over(w)) / F.lit(1_000_000.0)
    dist = geodesic_m(
        F.lag(F.col(lat_col)).over(w),
        F.lag(F.col(lon_col)).over(w),
        F.col(lat_col),
        F.col(lon_col),
        method=distance,
    )
    v = F.when(dt > 0, dist / dt)
    # dt and velocity are independent: one withColumns = one analysis pass
    df = df.withColumns({dt_col: dt, velocity_col: v})
    a = F.when(
        F.col(dt_col) > 0,
        (F.col(velocity_col) - F.lag(F.col(velocity_col)).over(w))
        / F.col(dt_col),
    )
    return df.withColumn(acceleration_col, a)


def exceed_bool_marking_pair(
    metric: Column, max_value: float, w: Window
) -> Column:
    """|metric| > max ⇒ flag this row AND the previous row of the pair
    (implemented forward: ``bool | lead(bool)``)."""
    b = F.abs(metric) > F.lit(max_value)
    b = F.coalesce(b, F.lit(False))
    return b | F.coalesce(F.lead(b).over(w), F.lit(False))


def apply_velocity_acceleration_check(
    df: DataFrame,
    max_velocity_ms: float,
    max_acceleration_ms2: float,
    lat_col: str = "lat",
    lon_col: str = "long",
    ts_col: str = "phenomenon_time",
    partition_cols: list[str] | None = None,
    flag_col: str = "qc_flag",
    order_extra: list[str] | None = None,
    distance: str = "haversine",
    marking: str = "pair",
    flag_on_true: int = QualityFlags.PROBABLY_BAD,
) -> DataFrame:
    """``marking`` picks which row(s) of an exceeding segment get flagged:

    - ``"pair"`` (default) — both rows of the pair, strict ``>``: the
      conservative QC stance (either endpoint could be the bad fix).
    - ``"reference"`` — the reference's exact convention, pinned by its
      shipped fixture and tests (``tests/test_qc.py:395-435`` replayed in
      ``tests/test_reference_goldens.py``): velocity/acceleration are
      assigned to the segment's FIRST row (its CSV columns show
      ``v[i] = dist(i→i+1)/dt[i]``), tail rows with no next fix fill 0,
      and the bound test is ``|x| ≥ max`` (``max_velocity=0`` must flag
      every row including the 0-filled tail — ``test_exceed_max_velocity_2``;
      a squeezed-dt segment must flag exactly its first row —
      ``test_exceed_max_velocity_3``; an acceleration spike flags the two
      rows carrying the spike's rise and fall — ``idx0-1`` and ``idx0``).

    The reference pipeline flags these BAD (``src/main.py:663-705``); this
    engine's QC chain historically uses PROBABLY_BAD — ``flag_on_true``
    keeps that default while letting reference-parity callers pass BAD.

    Convention note (no golden pins this): at a row whose NEXT segment is
    a same-time same-position duplicate pair, the pair's extended velocity
    is NULL (0 m / 0 s), so this row's acceleration nulls out and 0-fills
    — it is NOT flagged.  Pinned by
    ``tests/test_geo_operators.py::test_acceleration_convention_before_zero_dt_duplicate_pair``
    so a refactor can't silently swap to the fill-v=0-then-diff reading.
    """
    parts = partition_cols or []
    order_cols = [F.col(ts_col)] + [F.col(c) for c in (order_extra or [])]
    w = (
        Window.partitionBy(*parts).orderBy(*order_cols)
        if parts
        else Window.orderBy(*order_cols)
    )
    df = with_velocity_acceleration(
        df, lat_col, lon_col, ts_col, partition_cols, order_extra,
        distance=distance,
    )
    if marking == "reference":
        # backward → forward re-index: this engine's v[i] covers segment
        # (i-1, i); the reference's v_ref[i] covers (i, i+1) = lead(v).
        # a_ref[i] = (v_ref[i+1] - v_ref[i]) / dt_ref[i]; dt_ref = lead(dt).
        # staged withColumns: window expressions cannot nest inside lead()
        # dt == 0 (exact duplicate timestamps): with_velocity_acceleration
        # emits NULL there, but pandas float division gives ±inf when the
        # position moved — the reference flags those rows and a 0-fill
        # would silently pass them.  Movement with zero elapsed time is
        # reconstructed from the coordinates (dist > 0 ⇔ unequal coords,
        # for every distance kernel); the 0/0 case follows the
        # reference's blanket fillna(0) convention the golden tails pin.
        same_pos_fwd = (
            F.col(lat_col).eqNullSafe(F.lead(F.col(lat_col)).over(w))
        ) & (F.col(lon_col).eqNullSafe(F.lead(F.col(lon_col)).over(w)))
        df = df.withColumns(
            {
                "_v_fwd": F.lead(F.col("velocity_ms")).over(w),
                "_dt_fwd": F.lead(F.col("dt_s")).over(w),
                "_same_fwd": same_pos_fwd,
            }
        )
        inf = F.lit(float("inf"))
        v_ext = F.when(F.col("_dt_fwd") > 0, F.col("_v_fwd")).when(
            (F.col("_dt_fwd") == 0) & ~F.col("_same_fwd"), inf
        )
        delta = F.lead(v_ext).over(w) - v_ext  # IEEE on inf operands
        a_ext = F.when(
            F.col("_dt_fwd") > 0, delta / F.col("_dt_fwd")
        ).when(
            (F.col("_dt_fwd") == 0)
            & ~F.isnan(delta)
            & (delta != 0),
            inf,
        )
        bad_v = F.abs(
            F.coalesce(F.nanvl(v_ext, F.lit(0.0)), F.lit(0.0))
        ) >= F.lit(max_velocity_ms)
        bad_a = F.abs(
            F.coalesce(F.nanvl(a_ext, F.lit(0.0)), F.lit(0.0))
        ) >= F.lit(max_acceleration_ms2)
    elif marking == "pair":
        bad_v = exceed_bool_marking_pair(
            F.col("velocity_ms"), max_velocity_ms, w
        )
        bad_a = exceed_bool_marking_pair(
            F.col("acceleration_ms2"), max_acceleration_ms2, w
        )
    else:
        raise ValueError(f"unknown marking {marking!r} (pair|reference)")
    new_flag = flag_from_bool(
        bad_v | bad_a,
        flag_on_true=flag_on_true,
        flag_on_false=QualityFlags.NO_QUALITY_CONTROL,
    )
    out = df.withColumn(flag_col, flag_merge(F.col(flag_col), new_flag))
    if marking == "reference":
        # only this branch materialized the forward-looking helper
        # columns; an unconditional drop was a wasted analysis pass in
        # pair mode (drop of absent columns still re-analyzes the plan)
        out = out.drop("_v_fwd", "_dt_fwd", "_same_fwd")
    return out

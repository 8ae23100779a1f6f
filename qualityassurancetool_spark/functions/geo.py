"""Geodesic helpers as pure Column expressions.

The reference computes geodesic (Karney) distances via geopy inside its
velocity/acceleration and spatial-outlier checks (reference
``tests/test_qc.py:33-47``, ``src/main.py:612-710``).  At ship-track scales
(≤ tens of km between consecutive fixes) haversine agrees with geodesic to
≤ 0.5 % — we implement haversine as JVM-side Column math (whole-stage
codegen, no UDF) and document the tolerance; an exact geopy pandas-UDF
variant can be swapped in where the tolerance matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8  # IUGG mean Earth radius


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters between two (lat, lon) points (degrees)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    )
    # asin(sqrt(a)) form is numerically stable for small distances
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


# DuckDB-runnable SQL fragment mirroring haversine_m (same constant, same form)
def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2 * {EARTH_RADIUS_M} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )


# WGS-84 ellipsoid (public constants)
WGS84_A_M = 6378137.0
WGS84_F = 1.0 / 298.257223563


def lambert_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Ellipsoidal (WGS-84) distance via Lambert's formula — pure Column
    math, whole-stage codegen, ~10 m accuracy over thousands of km (vs
    haversine's ~0.5 % spherical error).  The middle option between
    haversine and an exact library geodesic: no UDF, no dependency.

    Lambert: reduced latitudes β = atan((1−f)·tan(φ)), central angle σ
    from haversine on (β, λ), then the P/Q flattening corrections.
    """
    f = WGS84_F
    b1 = F.atan((1 - f) * F.tan(F.radians(lat1)))
    b2 = F.atan((1 - f) * F.tan(F.radians(lat2)))
    dlon = F.radians(lon2 - lon1)
    a_h = (
        F.pow(F.sin((b2 - b1) / 2), 2)
        + F.cos(b1) * F.cos(b2) * F.pow(F.sin(dlon / 2), 2)
    )
    sigma = 2 * F.asin(F.least(F.sqrt(a_h), F.lit(1.0)))
    # P = (β1+β2)/2, Q = (β2−β1)/2
    p, q = (b1 + b2) / 2, (b2 - b1) / 2
    sin_sigma = F.sin(sigma)
    # guard the σ→0 and σ→π singularities: corrections vanish at 0
    x = F.when(
        sin_sigma != 0,
        (sigma - sin_sigma)
        * F.pow(F.sin(p), 2) * F.pow(F.cos(q), 2)
        / F.pow(F.cos(sigma / 2), 2),
    ).otherwise(F.lit(0.0))
    # sin(σ/2) = 0 only at σ = 0, which the guard already excludes
    y = F.when(
        sin_sigma != 0,
        (sigma + sin_sigma)
        * F.pow(F.cos(p), 2) * F.pow(F.sin(q), 2)
        / F.pow(F.sin(sigma / 2), 2),
    ).otherwise(F.lit(0.0))
    return WGS84_A_M * (sigma - f / 2 * (x + y))


def geodesic_m(
    lat1: Column,
    lon1: Column,
    lat2: Column,
    lon2: Column,
    method: str = "auto",
) -> Column:
    """Distance with a selectable accuracy/throughput tradeoff — the
    escape hatch for callers pinned to the reference's geopy geodesic
    (reference fixtures assert Karney distances, ``tests/test_qc.py:37-43``):

    - ``"haversine"`` — spherical, fastest, ≤0.5 % error;
    - ``"lambert"`` — WGS-84 ellipsoidal correction, pure Columns, ~10 m;
    - ``"auto"`` — lambert (best no-dependency accuracy).

    An exact Karney implementation needs a library (geopy/pyproj, absent
    from this container); when one is importable, wire it through a pandas
    UDF over (lat1, lon1, lat2, lon2) — the operators only consume a
    distance Column, so the swap is local to this function.
    """
    if method == "haversine":
        return haversine_m(lat1, lon1, lat2, lon2)
    if method in ("auto", "lambert"):
        return lambert_m(lat1, lon1, lat2, lon2)
    raise ValueError(f"unknown geodesic method {method!r}")

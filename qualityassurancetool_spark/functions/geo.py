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

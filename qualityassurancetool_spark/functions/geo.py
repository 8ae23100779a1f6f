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

import pandas as pd  # module-level: pandas_udf type hints resolve here
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
    # guard BOTH singularities with an epsilon, not exact-zero tests:
    # σ→0 (coincident) and σ→π (antipodal, cos²(σ/2)→0 — Lambert's known
    # breakdown where the P/Q corrections blow up).  Near either end the
    # flattening correction is dropped and the arc term a·σ stands alone
    # (error there ~f·a ≈ 21 km worst-case at exact antipodes, but finite
    # — unlike the unguarded division, which diverges).
    _EPS = 1e-6
    regular = (sin_sigma > _EPS) & (sigma < 3.141592653589793 - _EPS)
    x = F.when(
        regular,
        (sigma - sin_sigma)
        * F.pow(F.sin(p), 2) * F.pow(F.cos(q), 2)
        / F.pow(F.cos(sigma / 2), 2),
    ).otherwise(F.lit(0.0))
    # sin(σ/2) = 0 only at σ = 0, which the guard already excludes
    y = F.when(
        regular,
        (sigma + sin_sigma)
        * F.pow(F.cos(p), 2) * F.pow(F.sin(q), 2)
        / F.pow(F.sin(sigma / 2), 2),
    ).otherwise(F.lit(0.0))
    return WGS84_A_M * (sigma - f / 2 * (x + y))


def vincenty_m_np(
    lat1, lon1, lat2, lon2, max_iter: int = 200, return_converged: bool = False
):
    """Vectorized Vincenty inverse on the WGS-84 ellipsoid (numpy arrays
    of degrees → meters).  Public algorithm (Vincenty 1975); agrees with
    the exact Karney geodesic to sub-millimeter except *near-antipodal*
    pairs, where Vincenty's λ-iteration may not converge — those rows
    (and only those) fall back to the spherical great-circle value, and
    coincident points short-circuit to 0.  With
    ``return_converged=True`` also returns the per-row convergence mask
    so callers (the pandas UDF) can re-solve exactly the failed band
    with the vendored Karney solver (:mod:`.karney`).

    All rows iterate together under a convergence mask (no per-row Python
    loop), so the kernel is Arrow-batch friendly for the pandas UDF in
    :func:`geodesic_udf_m`.
    """
    import numpy as np

    a, f = WGS84_A_M, WGS84_F
    b = a * (1 - f)
    p1, p2 = np.radians(np.asarray(lat1, float)), np.radians(np.asarray(lat2, float))
    L = np.radians(np.asarray(lon2, float) - np.asarray(lon1, float))
    # normalize to [-pi, pi] so east/west wrap converges
    L = (L + np.pi) % (2 * np.pi) - np.pi
    U1, U2 = np.arctan((1 - f) * np.tan(p1)), np.arctan((1 - f) * np.tan(p2))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    active = np.ones(L.shape, dtype=bool)
    sin_sig = np.zeros_like(L)
    cos_sig = np.ones_like(L)
    sigma = np.zeros_like(L)
    cos2_alpha = np.ones_like(L)
    cos_2sigm = np.ones_like(L)
    for _ in range(max_iter):
        if not active.any():
            break
        sl, cl = np.sin(lam), np.cos(lam)
        ss = np.sqrt(
            (cosU2 * sl) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cl) ** 2
        )
        cs = sinU1 * sinU2 + cosU1 * cosU2 * cl
        sig = np.arctan2(ss, cs)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(ss != 0, cosU1 * cosU2 * sl / ss, 0.0)
            c2a = 1.0 - sin_alpha**2
            # equatorial line (cos²α = 0): cos(2σₘ) term drops out
            c2sm = np.where(c2a != 0, cs - 2 * sinU1 * sinU2 / np.where(c2a == 0, 1, c2a), 0.0)
        C = f / 16 * c2a * (4 + f * (4 - 3 * c2a))
        lam_new = L + (1 - C) * f * sin_alpha * (
            sig + C * ss * (c2sm + C * cs * (-1 + 2 * c2sm**2))
        )
        upd = active
        sin_sig = np.where(upd, ss, sin_sig)
        cos_sig = np.where(upd, cs, cos_sig)
        sigma = np.where(upd, sig, sigma)
        cos2_alpha = np.where(upd, c2a, cos2_alpha)
        cos_2sigm = np.where(upd, c2sm, cos_2sigm)
        converged = np.abs(lam_new - lam) < 1e-12
        lam = np.where(active, lam_new, lam)
        active = active & ~converged
    # `active` still True ⇒ non-convergent (near-antipodal)
    u2 = cos2_alpha * (a**2 - b**2) / b**2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    d_sig = B * sin_sig * (
        cos_2sigm
        + B / 4 * (
            cos_sig * (-1 + 2 * cos_2sigm**2)
            - B / 6 * cos_2sigm * (-3 + 4 * sin_sig**2) * (-3 + 4 * cos_2sigm**2)
        )
    )
    s = b * A * (sigma - d_sig)
    if active.any():
        # spherical fallback only where Vincenty cannot converge
        R = EARTH_RADIUS_M
        dlat, dlon = p2 - p1, L
        h = np.sin(dlat / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlon / 2) ** 2
        s = np.where(active, 2 * R * np.arcsin(np.minimum(np.sqrt(h), 1.0)), s)
    out = np.where(sin_sig + np.abs(sigma) == 0, 0.0, s)
    if return_converged:
        return out, ~active
    return out


def geodesic_udf_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Exact-geodesic distance as an Arrow-batched pandas UDF.

    Uses geopy's Karney geodesic when importable (the reference's exact
    library — fixtures pin it, ``tests/test_qc.py:33-47``); otherwise
    the vectorized Vincenty kernel for every row it converges on
    (sub-mm agreement with Karney, proven in-container by
    ``tests/test_geodesic_exact.py``) with the rare non-convergent
    near-antipodal rows re-solved EXACTLY by the vendored pure-Python
    Karney solver (:mod:`.karney`) — so the no-dependency path is exact
    everywhere, not exact-except-antipodes.  This is the UDF swap point
    :func:`geodesic_m` documents: only distances cross the Arrow
    boundary, four doubles in, one out."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dist(la1: pd.Series, lo1: pd.Series, la2: pd.Series, lo2: pd.Series) -> pd.Series:
        try:  # exact Karney via geopy, when the image ships it
            from geopy.distance import geodesic

            return pd.Series(
                [
                    geodesic((a_, b_), (c_, d_)).meters
                    if not (pd.isna(a_) or pd.isna(b_) or pd.isna(c_) or pd.isna(d_))
                    else None
                    for a_, b_, c_, d_ in zip(la1, lo1, la2, lo2)
                ]
            )
        except ImportError:
            import numpy as np

            from qualityassurancetool_spark.functions.karney import (
                karney_inverse_np,
            )

            a1, o1 = la1.to_numpy(), lo1.to_numpy()
            a2, o2 = la2.to_numpy(), lo2.to_numpy()
            s, ok = vincenty_m_np(a1, o1, a2, o2, return_converged=True)
            bad = ~ok & ~(
                np.isnan(a1) | np.isnan(o1) | np.isnan(a2) | np.isnan(o2)
            )
            if bad.any():  # near-antipodal band: exact Karney per row
                s = s.copy()
                s[bad] = karney_inverse_np(a1[bad], o1[bad], a2[bad], o2[bad])
            return pd.Series(s)

    return _dist(lat1, lon1, lat2, lon2)


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
    - ``"exact"`` — Arrow-batched pandas UDF: geopy Karney when
      importable, else vectorized Vincenty (:func:`geodesic_udf_m`);
    - ``"auto"`` — lambert (best whole-stage-codegen accuracy; the UDF
      leaves codegen, so exactness is opt-in).
    """
    if method == "haversine":
        return haversine_m(lat1, lon1, lat2, lon2)
    if method in ("auto", "lambert"):
        return lambert_m(lat1, lon1, lat2, lon2)
    if method == "exact":
        return geodesic_udf_m(lat1, lon1, lat2, lon2)
    raise ValueError(f"unknown geodesic method {method!r}")


def vincenty_direct(
    lat1_deg: float,
    lon1_deg: float,
    bearing_deg: float,
    distance_m: float,
) -> tuple[float, float]:
    """Vincenty *direct* problem on WGS-84: destination (lat, lon) from a
    start point, initial bearing and geodesic distance.  Public algorithm
    (Vincenty 1975, eqs. 1-12); the direct iteration always converges.

    Driver-side scalar helper — used to reconstruct the reference's
    ``data_velocity_acc.csv`` track exactly the way its fixture does with
    geopy's ``distance(...).destination(point, bearing)`` (reference
    ``tests/test_qc.py:33-47``): sub-millimeter agreement with the Karney
    geodesic at track scales, so the replayed golden velocities match.
    """
    import math

    a, f = WGS84_A_M, WGS84_F
    b = a * (1.0 - f)
    phi1 = math.radians(lat1_deg)
    alpha1 = math.radians(bearing_deg)
    s = float(distance_m)

    tan_u1 = (1.0 - f) * math.tan(phi1)
    cos_u1 = 1.0 / math.sqrt(1.0 + tan_u1 * tan_u1)
    sin_u1 = tan_u1 * cos_u1
    sigma1 = math.atan2(tan_u1, math.cos(alpha1))
    sin_alpha = cos_u1 * math.sin(alpha1)
    cos_sq_alpha = 1.0 - sin_alpha * sin_alpha
    u_sq = cos_sq_alpha * (a * a - b * b) / (b * b)
    big_a = 1.0 + u_sq / 16384.0 * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq))
    )
    big_b = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))

    sigma = s / (b * big_a)
    for _ in range(200):
        two_sigma_m = 2.0 * sigma1 + sigma
        sin_sigma, cos_sigma = math.sin(sigma), math.cos(sigma)
        cos_2sm = math.cos(two_sigma_m)
        delta_sigma = (
            big_b
            * sin_sigma
            * (
                cos_2sm
                + big_b
                / 4.0
                * (
                    cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm)
                    - big_b
                    / 6.0
                    * cos_2sm
                    * (-3.0 + 4.0 * sin_sigma * sin_sigma)
                    * (-3.0 + 4.0 * cos_2sm * cos_2sm)
                )
            )
        )
        sigma_new = s / (b * big_a) + delta_sigma
        if abs(sigma_new - sigma) < 1e-14:
            sigma = sigma_new
            break
        sigma = sigma_new

    two_sigma_m = 2.0 * sigma1 + sigma
    sin_sigma, cos_sigma = math.sin(sigma), math.cos(sigma)
    cos_2sm = math.cos(two_sigma_m)
    tmp = sin_u1 * sin_sigma - cos_u1 * cos_sigma * math.cos(alpha1)
    phi2 = math.atan2(
        sin_u1 * cos_sigma + cos_u1 * sin_sigma * math.cos(alpha1),
        (1.0 - f) * math.sqrt(sin_alpha * sin_alpha + tmp * tmp),
    )
    lam = math.atan2(
        sin_sigma * math.sin(alpha1),
        cos_u1 * cos_sigma - sin_u1 * sin_sigma * math.cos(alpha1),
    )
    big_c = f / 16.0 * cos_sq_alpha * (4.0 + f * (4.0 - 3.0 * cos_sq_alpha))
    big_l = lam - (1.0 - big_c) * f * sin_alpha * (
        sigma
        + big_c
        * sin_sigma
        * (cos_2sm + big_c * cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm))
    )
    lon2 = math.radians(lon1_deg) + big_l
    return math.degrees(phi2), math.degrees(lon2)

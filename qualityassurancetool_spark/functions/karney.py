"""Exact geodesic inverse problem on the WGS-84 ellipsoid, pure Python.

The reference pins geopy's Karney geodesic in its fixtures
(``/root/reference/tests/test_qc.py:33-47``); geopy is absent from this
container, so exact parity must be provable without it.  This module
solves the inverse problem with the method of Karney, "Algorithms for
geodesics", J. Geodesy 87(1):43-55 (2013), public literature — but
evaluates the paper's EXACT auxiliary-sphere integrals (eqs. 5-8) with
Gauss-Legendre quadrature instead of the truncated series expansions:

- distance:   ``s = b * I1(sigma)``,  ``I1 = ∫ sqrt(1 + k² sin²σ) dσ``
  with ``k = e' cos(alpha0)``;
- longitude:  ``lambda = omega − f sin(alpha0) * I3(sigma)``,
  ``I3 = ∫ (2−f) / (1 + (1−f) sqrt(1 + k² sin²σ)) dσ``;

and finds the departure azimuth by bisection on the canonical form
(points arranged so β1 ≤ 0, |β1| ≥ |β2|, λ12 ∈ [0, π], cos α2 ≥ 0 —
under which λ12(α1) increases monotonically from 0 to π, Karney §4).
A 64-point quadrature makes both integrals accurate to ~1e-15 relative,
so the result is limited only by the bisection tolerance (~1e-15 rad in
α1 → sub-0.1 mm in distance).  Converges in the antipodal band where
Vincenty's λ-iteration famously does not.

Scale shape: this is a DRIVER-SIDE / per-row oracle (bisection + two
quadratures per evaluation).  The Arrow-batched hot path stays the
vectorized Vincenty kernel (``functions.geo.vincenty_m_np``), which
agrees with this solver to sub-mm away from antipodes; the pandas UDF
falls back here only for the rare rows where Vincenty fails to
converge.
"""

from __future__ import annotations

import math

import numpy as np

from qualityassurancetool_spark.functions.geo import WGS84_A_M, WGS84_F

_A = WGS84_A_M
_F = WGS84_F
_B = _A * (1.0 - _F)
_E2 = _F * (2.0 - _F)           # first eccentricity squared
_EP2 = _E2 / (1.0 - _E2)        # second eccentricity squared

# Gauss-Legendre nodes/weights on [-1, 1], mapped per-call to [0, sigma]
_GL_X, _GL_W = np.polynomial.legendre.leggauss(64)


def _i1(sigma: float, k2: float) -> float:
    """∫₀^σ sqrt(1 + k² sin²σ') dσ' (distance integral, Karney eq. 7)."""
    half = 0.5 * sigma
    t = half * (_GL_X + 1.0)
    s = np.sin(t)
    return float(half * np.sum(_GL_W * np.sqrt(1.0 + k2 * s * s)))


def _i3(sigma: float, k2: float) -> float:
    """∫₀^σ (2−f)/(1+(1−f)·sqrt(1+k² sin²σ')) dσ' (longitude integral,
    Karney eq. 8 integrand)."""
    half = 0.5 * sigma
    t = half * (_GL_X + 1.0)
    s = np.sin(t)
    integrand = (2.0 - _F) / (1.0 + (1.0 - _F) * np.sqrt(1.0 + k2 * s * s))
    return float(half * np.sum(_GL_W * integrand))


def _beta(lat_deg: float) -> float:
    """Reduced latitude β = atan((1−f)·tanφ), poles exact."""
    if abs(lat_deg) == 90.0:
        return math.copysign(math.pi / 2.0, lat_deg)
    return math.atan((1.0 - _F) * math.tan(math.radians(lat_deg)))


def _meridional(beta1: float, beta2: float) -> float:
    """Same-meridian geodesic: α0 = 0, σ ≡ β, k = e'."""
    return _B * abs(_i1(beta2, _EP2) - _i1(beta1, _EP2))


def _spherical_terms(alpha1: float, beta1: float, beta2: float):
    """(λ12, s12) produced by departure azimuth ``alpha1`` from β1 under
    the canonical arrangement (cos α2 ≥ 0: β2 reached at its first
    crossing)."""
    sa1, ca1 = math.sin(alpha1), math.cos(alpha1)
    sb1, cb1 = math.sin(beta1), math.cos(beta1)
    sb2, cb2 = math.sin(beta2), math.cos(beta2)
    sin_a0 = sa1 * cb1
    cos2_a0 = 1.0 - sin_a0 * sin_a0
    k2 = _EP2 * cos2_a0
    sigma1 = math.atan2(sb1, ca1 * cb1)
    cos_a2 = math.sqrt(max(cos2_a0 - sb2 * sb2, 0.0)) / cb2
    sigma2 = math.atan2(sb2, cos_a2 * cb2)
    omega1 = math.atan2(sin_a0 * math.sin(sigma1), math.cos(sigma1))
    omega2 = math.atan2(sin_a0 * math.sin(sigma2), math.cos(sigma2))
    lam12 = (omega2 - omega1) - _F * sin_a0 * (_i3(sigma2, k2) - _i3(sigma1, k2))
    s12 = _B * (_i1(sigma2, k2) - _i1(sigma1, k2))
    return lam12, s12


def karney_inverse_m(
    lat1: float, lon1: float, lat2: float, lon2: float
) -> float:
    """Exact WGS-84 geodesic distance in meters between two points
    (degrees).  See module docstring for method and provenance."""
    # canonical longitude difference in [0, 180]
    lam = math.radians(abs(((lon2 - lon1) + 180.0) % 360.0 - 180.0))
    dphi = math.radians(lat2 - lat1)
    if abs(dphi) < 1e-6 and lam < 1e-6:
        # sub-~6 m separations: the auxiliary-sphere terms lose all
        # their precision to cancellation at this scale, while the
        # local ellipsoidal metric ds² = M²dφ² + (N cosφ)²dλ² is exact
        # to O((s/R)²·s) ≈ sub-nanometer here (M, N: meridional and
        # prime-vertical curvature radii at the mean latitude)
        phi = math.radians(0.5 * (lat1 + lat2))
        s2 = math.sin(phi) ** 2
        w = math.sqrt(1.0 - _E2 * s2)
        m_rad = _A * (1.0 - _E2) / (w * w * w)
        n_rad = _A / w
        return math.hypot(m_rad * dphi, n_rad * math.cos(phi) * lam)
    b1, b2 = _beta(lat1), _beta(lat2)
    # canonical points: |β1| ≥ |β2|, β1 ≤ 0
    if abs(b1) < abs(b2):
        b1, b2 = b2, b1
    if b1 > 0.0:
        b1, b2 = -b1, -b2

    if lam == 0.0 or abs(b2) == math.pi / 2.0 or b1 == -math.pi / 2.0:
        # same meridian, or a pole endpoint: meridional by construction
        # (λ at a pole is arbitrary)
        return _meridional(b1, b2)
    if abs(b1) < 1e-10 and abs(b2) < 1e-10:
        # BOTH endpoints (numerically) on the equator: β no longer
        # determines σ (the whole equator has β = 0), so the general
        # bisection degenerates — handle explicitly.  The 1e-10 rad
        # band is ≈ 0.6 mm of ground latitude; treating it as exactly
        # equatorial moves the answer by far less than the sub-mm
        # tolerance pinned in tests.
        if lam <= (1.0 - _F) * math.pi:
            # equatorial geodesic stays on the equator (arc of radius a)
            return _A * lam
        # equatorial near-antipodal: the geodesic leaves the equator.
        # Perturb one endpoint off the equator by 1e-12 rad (≈ 6 nm on
        # the ground) so the canonical bisection applies; distance error
        # is of the same order.
        b1 = -1e-12
        b2 = 0.0

    # bisection on α1 ∈ (0, π): λ12(α1) rises monotonically 0 → π
    lo, hi = 1e-15, math.pi - 1e-15
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        lam_mid, _s = _spherical_terms(mid, b1, b2)
        if lam_mid < lam:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-15:
            break
    # α1 can be ill-conditioned (equal-latitude geodesics put the root
    # a hair above π/2 where dλ/dα1 explodes), but s is SMOOTH in λ
    # (ds/dλ ≈ a·cosβ).  Interpolating s linearly in λ across the final
    # bracket removes the conditioning error (second-order in the
    # bracket width → sub-nm) instead of inheriting the λ residual
    # amplified by ds/dα1.
    lam_lo, s_lo = _spherical_terms(lo, b1, b2)
    lam_hi, s_hi = _spherical_terms(hi, b1, b2)
    if lam_hi > lam_lo:
        t = min(max((lam - lam_lo) / (lam_hi - lam_lo), 0.0), 1.0)
        return s_lo + t * (s_hi - s_lo)
    return 0.5 * (s_lo + s_hi)


def karney_inverse_np(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Elementwise :func:`karney_inverse_m` over arrays (driver-side /
    fallback-band use; the vectorized hot path is Vincenty)."""
    la1, lo1 = np.asarray(lat1, float), np.asarray(lon1, float)
    la2, lo2 = np.asarray(lat2, float), np.asarray(lon2, float)
    out = np.empty(la1.shape, dtype=float)
    flat = out.reshape(-1)
    for i, (a, b, c, d) in enumerate(
        zip(la1.reshape(-1), lo1.reshape(-1), la2.reshape(-1), lo2.reshape(-1))
    ):
        flat[i] = karney_inverse_m(a, b, c, d)
    return out

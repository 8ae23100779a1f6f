"""Hypothesis properties for the round-4 additions — randomized checks
against independent models, the test_properties.py convention."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from qualityassurancetool_spark.functions.geo import vincenty_m_np
from qualityassurancetool_spark.functions.karney import karney_inverse_m
from qualityassurancetool_spark.operators.calibration import pav

lat = st.floats(min_value=-89.0, max_value=89.0)
lon = st.floats(min_value=-179.0, max_value=179.0)


@settings(max_examples=60, deadline=None)
@given(lat, lon, lat, lon)
def test_karney_agrees_with_vincenty_or_is_antipodal(a, b, c, d):
    """Wherever the independent Vincenty iteration converges, the
    exact-integral Karney solver agrees to sub-mm; where it does not,
    Karney still returns a finite value inside the geodesic envelope
    [0, 2×quarter-meridian]."""
    v, ok = vincenty_m_np(
        np.array([a]), np.array([b]), np.array([c]), np.array([d]),
        return_converged=True,
    )
    k = karney_inverse_m(a, b, c, d)
    assert math.isfinite(k) and 0.0 <= k <= 2 * 10001965.8
    if ok[0]:
        assert abs(k - float(v[0])) < 1e-3
    # symmetry (to the last-ulp wobble of the longitude-wrap mod)
    assert karney_inverse_m(c, d, a, b) == __import__("pytest").approx(
        k, rel=1e-12, abs=1e-9
    )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=1.0),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_pav_properties(pairs):
    """PAV invariants on random instances: monotone output, weighted
    mean preserved, fit bracketed by input range, idempotent."""
    vals = [v for v, _w in pairs]
    wts = [float(w) for _v, w in pairs]
    fit = pav(vals, wts)
    assert all(x <= y + 1e-12 for x, y in zip(fit, fit[1:]))
    tot = sum(wts)
    assert sum(f * w for f, w in zip(fit, wts)) / tot == (
        __import__("pytest").approx(
            sum(v * w for v, w in zip(vals, wts)) / tot
        )
    )
    assert min(vals) - 1e-12 <= min(fit) and max(fit) <= max(vals) + 1e-12
    again = pav(fit, wts)
    assert all(abs(x - y) < 1e-12 for x, y in zip(fit, again))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=80),
    st.integers(min_value=2, max_value=6),
    st.integers(min_value=8, max_value=64),
)
def test_cms_model_never_underestimates(keys, depth, width):
    """Pure-model CMS (same md5 cell family as the operator): the
    estimate of every key is >= its true count, and the sketch total
    per row equals the stream length."""
    import hashlib

    def cell(k, r):
        h = hashlib.md5(f"cms:{r}:{k}".encode()).hexdigest()
        return int(h[:15], 16) % width

    table = {}
    for k in keys:
        for r in range(depth):
            c = (r, cell(k, r))
            table[c] = table.get(c, 0) + 1
    for r in range(depth):
        assert sum(v for (rr, _c), v in table.items() if rr == r) == len(keys)
    from collections import Counter

    exact = Counter(keys)
    for k, n in exact.items():
        est = min(table.get((r, cell(k, r)), 0) for r in range(depth))
        assert est >= n

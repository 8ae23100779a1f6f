"""Property-based tests (hypothesis) — beyond the reference's own test
strategy (SURVEY §5 notes it has none): randomized inputs against
independent python models for the three most correctness-critical
surfaces — flag algebra, the as-of join, and the np.gradient-parity
gradient."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import (
    FLAG_SEVERITY,
    flag_merge,
)
from qualityassurancetool_spark.operators.asof import asof_nearest_join
from qualityassurancetool_spark.operators.gradient import gradient_column

CODES = list(FLAG_SEVERITY.keys())
EPOCH = dt.datetime(2024, 1, 1)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _model_merge(codes: list[int | None]) -> int:
    ranks = [
        FLAG_SEVERITY[c] if c is not None else 0 for c in codes
    ]
    best = max(ranks)
    return next(c for c, r in FLAG_SEVERITY.items() if r == best)


@SLOW
@given(
    st.lists(
        st.tuples(
            st.sampled_from(CODES) | st.none(),
            st.sampled_from(CODES) | st.none(),
            st.sampled_from(CODES) | st.none(),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_flag_merge_matches_model_and_is_symmetric(spark, triples):
    rows = [
        (i, a if a is None else int(a), b if b is None else int(b),
         c if c is None else int(c))
        for i, (a, b, c) in enumerate(triples)
    ]
    df = spark.createDataFrame(
        rows, "id int, a tinyint, b tinyint, c tinyint"
    )
    out = df.select(
        "id",
        flag_merge("a", "b", "c").alias("m1"),
        flag_merge("c", "a", "b").alias("m2"),
    ).collect()
    want = {i: _model_merge([a, b, c]) for i, (a, b, c) in enumerate(triples)}
    for r in out:
        assert r["m1"] == want[r["id"]], triples[r["id"]]
        assert r["m2"] == r["m1"]  # merge is order-insensitive


def _model_asof(dep_ts: list[int], ind: list[tuple[int, int]], tol_us: int):
    """Nearest independent within tolerance; ties -> smaller ts then id."""
    out = {}
    for i, t in enumerate(dep_ts):
        best = None
        for iid, it in ind:
            d = abs(t - it)
            if d <= tol_us:
                key = (d, it, iid)
                if best is None or key < best[0]:
                    best = (key, iid)
        out[i] = None if best is None else best[1]
    return out


@SLOW
@given(
    st.lists(st.integers(0, 30_000_000), min_size=1, max_size=25),
    st.lists(st.integers(0, 30_000_000), min_size=0, max_size=25, unique=True),
    st.sampled_from([500_000, 1_000_000, 3_000_000]),
)
def test_asof_join_matches_bruteforce_model(spark, dep_us, ind_us, tol_us):
    dep_rows = [
        (i, EPOCH + dt.timedelta(microseconds=t)) for i, t in enumerate(dep_us)
    ]
    ind_rows = [
        (100 + j, EPOCH + dt.timedelta(microseconds=t))
        for j, t in enumerate(ind_us)
    ]
    dep = spark.createDataFrame(dep_rows, "dep_id int, phenomenon_time timestamp")
    ind = spark.createDataFrame(ind_rows, "iot_id int, phenomenon_time timestamp")
    got = {
        r["dep_id"]: r["ind_iot_id"]
        for r in asof_nearest_join(dep, ind, tol_us / 1e6).collect()
    }
    want_idx = _model_asof(
        dep_us, [(100 + j, t) for j, t in enumerate(ind_us)], tol_us
    )
    want = {i: want_idx[i] for i in range(len(dep_us))}
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10_000),  # seconds offsets (deduped below)
            st.floats(-1e3, 1e3, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=30,
        unique_by=lambda p: p[0],
    )
)
def test_gradient_matches_np_gradient_model(spark, points):
    points = sorted(points)
    ts = np.array([p[0] for p in points], dtype=np.float64)
    vals = np.array([p[1] for p in points], dtype=np.float64)
    want = np.gradient(vals, ts)
    rows = [
        (i, EPOCH + dt.timedelta(seconds=int(t)), float(v))
        for i, (t, v) in enumerate(points)
    ]
    df = spark.createDataFrame(
        rows, "iot_id int, phenomenon_time timestamp, result double"
    )
    g = gradient_column("result", "phenomenon_time", [], ["iot_id"])
    got = {
        r["iot_id"]: r["g"]
        for r in df.select("iot_id", g.alias("g")).collect()
    }
    for i in range(len(points)):
        assert got[i] == pytest.approx(want[i], rel=1e-9, abs=1e-12), (
            i,
            points,
        )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),          # user
            st.integers(min_value=0, max_value=100_000),    # offset sec
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=3600),               # gap sec
)
@SLOW
def test_sessionize_matches_python_model(spark, events, gap):
    from qualityassurancetool_spark.operators.sessionize import (
        with_session_ids,
    )

    rows = [
        (i, u, EPOCH + dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = {
        r["event_id"]: (r["user_id"], r["session_idx"])
        for r in with_session_ids(
            df, gap=float(gap), order_extra=["event_id"]
        ).collect()
    }

    # independent python model: sort per user by (ts, id), split on
    # strictly-greater gaps
    model = {}
    by_user = {}
    for i, (u, s) in enumerate(events):
        by_user.setdefault(u, []).append((s, i))
    for u, evs in by_user.items():
        evs.sort()
        sess = 0
        prev = None
        for s, i in evs:
            if prev is None or s - prev > gap:
                sess += 1
            model[i] = (u, sess)
            prev = s
    assert got == model


@SLOW
@given(
    st.lists(st.integers(0, 30_000_000), min_size=1, max_size=25),
    st.lists(st.integers(0, 30_000_000), min_size=0, max_size=25, unique=True),
    st.sampled_from([500_000, 1_000_000, 3_000_000]),
)
def test_asof_window_strategy_matches_bruteforce_model(
    spark, dep_us, ind_us, tol_us
):
    """Single-pass window as-of == the same brute-force model as the join
    strategy, with a bucket equal to the tolerance (maximal halo
    traffic)."""
    from qualityassurancetool_spark.operators.asof import asof_nearest_context

    rows = [
        (i, EPOCH + dt.timedelta(microseconds=t), 1)
        for i, t in enumerate(dep_us)
    ] + [
        (100 + j, EPOCH + dt.timedelta(microseconds=t), 0)
        for j, t in enumerate(ind_us)
    ]
    df = spark.createDataFrame(
        rows, "iot_id int, phenomenon_time timestamp, datastream_id int"
    )
    ann = asof_nearest_context(
        df,
        is_candidate=F.col("datastream_id") == 0,
        tolerance=tol_us / 1e6,
        payload_cols=["iot_id"],
        bucket=tol_us / 1e6,
    )
    got = {
        r["iot_id"]: (None if r["_asof"] is None else r["_asof"]["iot_id"])
        for r in ann.collect()
        if r["datastream_id"] == 1
    }
    want = _model_asof(
        dep_us, [(100 + j, t) for j, t in enumerate(ind_us)], tol_us
    )
    assert got == {i: want[i] for i in range(len(dep_us))}


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=2, max_size=12
    ),
    k=st.integers(min_value=1, max_value=3),
)
@SLOW
def test_decontam_matches_python_model(spark, texts, k):
    """benchmark_ngram_overlap == a brute-force python n-gram model for
    arbitrary (messy-whitespace) corpora; doc 0 is the benchmark."""
    from qualityassurancetool_spark.operators.decontam import (
        benchmark_ngram_overlap,
    )

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    bench = df.where(F.col("doc_id") == 0)
    train = df.where(F.col("doc_id") != 0)
    got = {
        r["doc_id"]: (r["n_overlap"], r["n_grams"])
        for r in benchmark_ngram_overlap(train, bench, k=k).collect()
    }

    def grams(t):
        # same normalize/tokenize contract as functions/hashing: collapse
        # whitespace, split on single spaces (empty text -> ['']).
        # A doc with fewer than k tokens has NO k-grams (round-8 review:
        # the whole-doc clamp read every short-doc pair as contaminated)
        toks = " ".join(t.lower().split()).split(" ")
        if len(toks) < k:
            return set()
        return {
            " ".join(toks[i : i + k])
            for i in range(len(toks) - (k - 1))
        }

    bench_set = grams(texts[0])
    want = {}
    for i, t in docs[1:]:
        gs = grams(t)
        n_ov = len(gs & bench_set)
        if n_ov >= 1:
            want[i] = (n_ov, len(gs))
    assert got == want


# ---------------------------------------------------------------------------
# round 3: geodesic kernel and mixture properties
# ---------------------------------------------------------------------------

_lat = st.floats(min_value=-85.0, max_value=85.0)
_lon = st.floats(min_value=-180.0, max_value=180.0)


@SLOW
@given(st.lists(st.tuples(_lat, _lon, _lat, _lon), min_size=1, max_size=30))
def test_vincenty_properties(pairs):
    """Symmetry, non-negativity, identity, and the spherical sandwich:
    Vincenty on WGS-84 stays within the flattening bound (~0.6%) of
    haversine for any pair (numpy-only — no Spark session needed)."""
    from qualityassurancetool_spark.functions.geo import (
        EARTH_RADIUS_M,
        vincenty_m_np,
    )

    la1, lo1, la2, lo2 = map(np.array, zip(*pairs))
    d = vincenty_m_np(la1, lo1, la2, lo2)
    assert np.all(np.isfinite(d)) and np.all(d >= 0)
    np.testing.assert_allclose(
        d, vincenty_m_np(la2, lo2, la1, lo1), rtol=1e-9, atol=1e-6
    )
    assert np.all(vincenty_m_np(la1, lo1, la1, lo1) == 0.0)
    # spherical comparison (same haversine the Column expr uses)
    p1, p2 = np.radians(la1), np.radians(la2)
    dl = np.radians(lo2 - lo1)
    h = (
        np.sin((p2 - p1) / 2) ** 2
        + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    )
    hav = 2 * EARTH_RADIUS_M * np.arcsin(np.minimum(np.sqrt(h), 1.0))
    far = hav > 1000.0  # relative bound is meaningless at meter scales
    assert np.all(np.abs(d[far] - hav[far]) <= 0.0067 * hav[far])


@SLOW
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
             max_size=80, unique=True),
    st.floats(min_value=0.0, max_value=3.0),
)
def test_mixture_epoch_counts(spark, ids, weight):
    """Full epochs contribute every row exactly once; the fractional
    epoch is exactly the md5-sampled subset; total = closed form."""
    import math

    from qualityassurancetool_spark.operators.mixing import mix_corpora
    from qualityassurancetool_spark.operators.sampling import uniform_hash

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    mix = mix_corpora({"s": df}, {"s": weight})
    full = int(math.floor(weight))
    frac = weight - full
    per_epoch = {
        r["epoch"]: r["cnt"]
        for r in mix.groupBy("epoch").agg(F.count("*").alias("cnt")).collect()
    }
    for e in range(full):
        assert per_epoch.get(e) == len(ids)
    if frac > 0:
        esalt = f"mix:s:{full}:"
        expected = df.where(
            uniform_hash(F.col("doc_id"), esalt) < frac
        ).count()
        assert per_epoch.get(full, 0) == expected
    assert sum(per_epoch.values()) == mix.count()

"""Hypothesis properties for the sixth-batch operators: interval join
vs naive BETWEEN, heavy hitters vs exact groupBy, Morton key
bijectivity — randomized inputs against independent models."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    pts=st.lists(
        st.floats(
            min_value=-50.0, max_value=150.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1, max_size=40,
    ),
    ivs=st.lists(
        st.tuples(
            st.floats(min_value=-60.0, max_value=160.0,
                      allow_nan=False, allow_infinity=False),
            st.floats(min_value=0.0, max_value=30.0,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1, max_size=15,
    ),
    width=st.sampled_from([0.7, 3.0, 11.0]),
)
def test_interval_lookup_equals_naive_between(spark, pts, ivs, width):
    from qualityassurancetool_spark.operators.interval_join import (
        interval_lookup,
    )

    p = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(pts)], ["pid", "x"]
    )
    iv = spark.createDataFrame(
        [(j, float(a), float(a + w)) for j, (a, w) in enumerate(ivs)],
        ["iid", "lo", "hi"],
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_lookup(p, iv, "x", bucket_width=width).collect()
    }
    want = {
        (i, j)
        for i, x in enumerate(pts)
        for j, (a, w) in enumerate(ivs)
        if a <= x <= a + w
    }
    assert got == want


@SLOW
@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=60),
        min_size=1, max_size=25,
    ),
    frac=st.sampled_from([0.05, 0.15, 0.4]),
)
def test_heavy_hitters_equals_exact_filter(spark, counts, frac):
    from qualityassurancetool_spark.operators.heavy_hitters import (
        heavy_hitters,
    )

    rows = [(f"k{i}",) for i, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, ["k"]).repartition(5)
    got = {
        r["k"]: r["n"]
        for r in heavy_hitters(df, "k", min_fraction=frac).collect()
    }
    total = sum(counts)
    want = {
        f"k{i}": c for i, c in enumerate(counts) if c >= total * frac
    }
    assert got == want


def _py_deinterleave(z: int) -> tuple[int, int]:
    x = y = 0
    for i in range(32):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@SLOW
@given(
    cells=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1, max_size=60,
    )
)
def test_morton_key_is_bijective(spark, cells):
    """Deinterleaving the engine's key recovers exactly the input
    cells — the key loses no spatial information (and therefore two
    distinct cells never collide)."""
    from qualityassurancetool_spark.functions.zorder import morton_key

    df = spark.createDataFrame(cells, ["x", "y"])
    for r in df.select(
        "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
    ).collect():
        assert _py_deinterleave(r["z"]) == (r["x"], r["y"])

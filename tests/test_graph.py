"""PageRank (operators/graph).
Cross-engine parity: tools/extra_oracles.py::x_pagerank."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _numpy_pagerank(pairs, n_ids, iters, d=0.85):
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, _ in pairs:
        out[s] = out.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t in pairs:
            contrib[t] += r[s] / out[s]
        dang = sum(r[v] for v in nodes if v not in out)
        r = {
            v: (1 - d) / n + d * (contrib[v] + dang / n) for v in nodes
        }
    return r


def test_matches_numpy_reference(spark):
    pairs = [
        (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 1), (1, 4), (6, 1),
        # 7 is dangling (appears only as dst)
        (2, 7),
    ]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, pairs), iters=6).collect()
    }
    want = _numpy_pagerank(pairs, 7, 6)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)
    # mass conservation: dangling redistribution keeps sum at 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_zero_iters_is_uniform(spark):
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, [(1, 2), (2, 3)]), iters=0).collect()
    }
    assert got == {1: pytest.approx(1 / 3), 2: pytest.approx(1 / 3),
                   3: pytest.approx(1 / 3)}


def test_authority_ordering(spark):
    # symmetric hub: 0 links to and from every spoke.  (A single
    # back-edge 0→1 instead makes rank mass ping-pong between 0 and 1
    # with period 2 — a real property of synchronous PageRank, not a
    # bug; the symmetric hub converges monotonically.)
    pairs = [(i, 0) for i in range(1, 8)] + [(0, i) for i in range(1, 8)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, pairs), iters=8).collect()
    }
    assert got[0] > max(v for k, v in got.items() if k != 0)


def test_validation(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        pagerank(e, iters=-1)
    with pytest.raises(ValueError):
        pagerank(e, damping=1.5)


def test_tolerance_early_stop_matches_converged_ranks(spark):
    """With tol set, the result equals running the full iteration
    budget (the chain has converged), and validation rejects bad tol."""
    pairs = [(i, 0) for i in range(1, 8)] + [(0, i) for i in range(1, 8)]
    full = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, pairs), iters=60).collect()
    }
    tolled = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges(spark, pairs), iters=60, tol=1e-10
        ).collect()
    }
    for v in full:
        assert tolled[v] == pytest.approx(full[v], abs=1e-8)
    with pytest.raises(ValueError):
        pagerank(_edges(spark, pairs), tol=0.0)

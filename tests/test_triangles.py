"""Triangle counting (operators/graph.triangle_count): known graphs,
brute-force parity on a pseudo-random graph, input-noise discipline
(duplicates, direction, self-loops)."""

import itertools
import random

from qualityassurancetool_spark.operators.graph import triangle_count


def test_k4_with_noise(spark):
    edges = [
        (a, b) for a, b in itertools.combinations(range(4), 2)
    ] + [(3, 4), (5, 6), (1, 0), (2, 2), (0, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_free_graph_empty(spark):
    # a path and a star: no triangles at all
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (10, 12), (10, 13)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert triangle_count(df).count() == 0


def test_random_graph_matches_brute_force(spark):
    rng = random.Random(3)
    n, m = 40, 200
    es = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(m)
            )
            if a != b
        }
    )
    adj = {i: set() for i in range(n)}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for u, v, w in itertools.combinations(range(n), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for x in (u, v, w):
                want[x] = want.get(x, 0) + 1
    df = spark.createDataFrame(es, ["src", "dst"])
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == want


def test_hub_graph_degree_ordering_correct(spark):
    # hub 0 connected to 1..20, plus ring edges among 1..20 closing
    # triangles through the hub — degree ordering must not miscount
    edges = [(0, i) for i in range(1, 21)] + [
        (i, i % 20 + 1) for i in range(1, 21)
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    # each ring edge (i, i+1) forms one triangle with the hub: 20 total
    assert got[0] == 20
    assert all(got[i] == 2 for i in range(1, 21))

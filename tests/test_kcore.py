"""k_core — Matula–Beck peeling as dataflow."""

import pytest

from qualityassurancetool_spark.operators.graph import k_core


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], schema="src long, dst long"
    )


def _core(spark, pairs, k, strategy="auto"):
    return {
        r["node"]: r["degree"]
        for r in k_core(_edges(spark, pairs), k, strategy=strategy).collect()
    }


def test_clique_with_pendant_path(spark):
    # K4 on 0-3 plus a pendant path 3-4-5-6: the 3-core is exactly K4
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    path = [(3, 4), (4, 5), (5, 6)]
    got = _core(spark, k4 + path, 3)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_pure_path_two_core_empty_cascade(spark):
    # peeling a path for k=2 cascades from both ends to nothing —
    # exercises multi-round convergence, not single-shot filtering
    path = [(i, i + 1) for i in range(12)]
    assert _core(spark, path, 2) == {}


def test_cycle_is_its_own_two_core(spark):
    cyc = [(i, (i + 1) % 8) for i in range(8)]
    assert _core(spark, cyc, 2) == {i: 2 for i in range(8)}


def test_within_core_degree_not_original_degree(spark):
    # 0-1-2 triangle, node 0 also touches pendant 9: after the peel
    # node 0's reported degree must be 2 (core-internal), not 3
    tri = [(0, 1), (1, 2), (0, 2), (0, 9)]
    got = _core(spark, tri, 2)
    assert got == {0: 2, 1: 2, 2: 2}


def test_k_above_max_degree_empty_and_duplicates_collapse(spark):
    e = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (2, 2)]
    assert _core(spark, e, 5) == {}
    # duplicates/direction/self-loop collapse: triangle survives k=2
    assert _core(spark, e, 2) == {0: 2, 1: 2, 2: 2}


def test_nested_cores(spark):
    # K5 (ids 100..104) bridged to a C4 (ids 0..3): 2-core = both,
    # 3-core and 4-core = K5 only
    k5 = [
        (100 + a, 100 + b) for a in range(5) for b in range(a + 1, 5)
    ]
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    bridge = [(0, 100)]
    all_e = k5 + c4 + bridge
    two = _core(spark, all_e, 2)
    assert set(two) == {0, 1, 2, 3, 100, 101, 102, 103, 104}
    four = _core(spark, all_e, 4)
    assert four == {100 + i: 4 for i in range(5)}


def test_validation(spark):
    with pytest.raises(ValueError):
        k_core(_edges(spark, [(0, 1)]), 0)


def test_nonconvergence_raises_not_wrong_answer(spark):
    """A long path at k=2 peels 2 endpoints per round; exhausting
    max_iters mid-peel must raise, not return the unconverged edge
    set's degree filter as if it were the core."""
    import pytest

    from qualityassurancetool_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    # BOTH strategies honor the wave budget identically
    for strat in ("local", "distributed"):
        with pytest.raises(RuntimeError, match="did not converge"):
            k_core(edges, k=2, max_iters=3, strategy=strat).collect()
        # with budget, the path's 2-core is (correctly) empty
        assert k_core(edges, k=2, max_iters=40, strategy=strat).count() == 0


def test_convergence_on_final_iteration_returns_core(spark):
    """Landing exactly on the fixpoint at max_iters must RETURN the
    core (the in-loop check confirms convergence one iteration late;
    a post-loop degree verification covers the boundary)."""
    from qualityassurancetool_spark.operators.graph import k_core

    # triangle + one pendant edge: ONE peel round reaches the 2-core
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    for strat in ("local", "distributed"):
        got = {
            r["node"]: r["degree"]
            for r in k_core(
                edges, k=2, max_iters=1, strategy=strat
            ).collect()
        }
        assert got == {1: 2, 2: 2, 3: 2}


def test_local_distributed_parity(spark):
    """The round-11 scale-adaptive local peel must be observationally
    identical to the distributed peel on every graph shape the suite
    exercises (nested cores, cascades-to-empty, within-core degrees,
    duplicate/self-loop collapse)."""
    import random

    rng = random.Random(11)
    shapes = [
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(3, 4), (4, 5), (5, 6)],
        [(i, i + 1) for i in range(12)],
        [(i, (i + 1) % 8) for i in range(8)],
        [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (2, 2)],
        [(rng.randrange(40), rng.randrange(40)) for _ in range(160)],
    ]
    for pairs in shapes:
        pairs = [(a, b) for a, b in pairs if a != b] or [(0, 1)]
        for k in (2, 3):
            assert _core(spark, pairs, k, strategy="local") == _core(
                spark, pairs, k, strategy="distributed"
            ), (pairs, k)


def test_auto_strategy_small_graph_runs_local(spark):
    """auto on a metadata-scale graph must take the driver path: the
    result plan contains no shuffle exchange and no checkpoint scan
    (a LocalTableScan/parallelize plan), while producing the same
    core."""
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    out = k_core(_edges(spark, pairs), 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert {r["node"]: r["degree"] for r in out.collect()} == {
        i: 4 for i in range(5)
    }


def test_repeated_runs_free_superseded_checkpoints(spark):
    """Each peel round localCheckpoints frames that the next round
    supersedes; those blocks must be freed eagerly (round-11: repeated
    k_core calls in one session previously accumulated every round's
    blocks until a driver GC happened to run).  Growth across repeated
    runs must be bounded by the RESULT frames we still hold, not by
    rounds x runs."""
    sc = spark.sparkContext
    # a chain graph peels one level per round -> several rounds
    pairs = [(a, b) for a in range(6) for b in range(a + 1, 6)] + [
        (5, 6), (6, 7), (7, 8), (8, 9)
    ]
    # strategy pinned: the leak being guarded lives in the
    # distributed peel loop's checkpoints (auto would go local here)
    k_core(_edges(spark, pairs), 3, strategy="distributed").count()
    before = len(sc._jsc.getPersistentRDDs())
    runs = 4
    for _ in range(runs):
        assert (
            k_core(_edges(spark, pairs), 3, strategy="distributed").count()
            == 6
        )
    grown = len(sc._jsc.getPersistentRDDs()) - before
    # old behavior: >= 2 checkpoints per round per run stay resident
    # (this graph peels 4+ rounds -> >= 8/run); new: only the returned
    # frame's degree checkpoint may linger (1/run)
    assert grown <= 2 * runs, grown

"""Efraimidis-Spirakis weighted sampling (operators/sampling)."""

from __future__ import annotations

from collections import Counter

from qualityassurancetool_spark.operators.sampling import (
    weighted_sample_topk,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, grp string, w double"
    )


def test_exact_k_and_determinism(spark):
    rows = [(i, "a" if i % 2 else "b", float(1 + i % 5)) for i in range(200)]
    df = _df(spark, rows)
    out1 = weighted_sample_topk(df, 10, "w", strata_col="grp")
    out2 = weighted_sample_topk(df, 10, "w", strata_col="grp")
    ids1 = sorted((r["grp"], r["doc_id"], r["sample_rank"]) for r in out1.collect())
    ids2 = sorted((r["grp"], r["doc_id"], r["sample_rank"]) for r in out2.collect())
    assert ids1 == ids2
    per = Counter(g for g, _, _ in ids1)
    assert per == {"a": 10, "b": 10}
    assert {r for _, _, r in ids1} == set(range(1, 11))


def test_zero_and_negative_weights_excluded(spark):
    rows = [(1, "a", 0.0), (2, "a", -3.0), (3, "a", 1.0), (4, "a", None)]
    out = weighted_sample_topk(_df(spark, rows), 10, "w")
    assert [r["doc_id"] for r in out.collect()] == [3]


def test_weight_bias(spark):
    """Across many salt-perturbed ids, heavy items appear far more often
    (statistical property of E-S keys; deterministic given the data)."""
    heavy = {i for i in range(1000) if i % 10 == 0}
    rows = [
        (i, "a", 50.0 if i in heavy else 1.0) for i in range(1000)
    ]
    out = weighted_sample_topk(_df(spark, rows), 100, "w")
    got = [r["doc_id"] for r in out.collect()]
    n_heavy = sum(1 for i in got if i in heavy)
    # 100 heavy items at weight 50 vs 900 at weight 1: expected heavy
    # share of a 100-sample is >> uniform's 10; require a wide margin
    assert n_heavy > 40, n_heavy


def test_global_topk_matches_strata_union_of_one(spark):
    """Global mode ranks identically to a single-stratum run."""
    rows = [(i, "only", float(1 + i % 7)) for i in range(50)]
    df = _df(spark, rows)
    g = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in weighted_sample_topk(df, 5, "w").collect()
    )
    s = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in weighted_sample_topk(df, 5, "w", strata_col="grp").collect()
    )
    assert g == s

"""MMR diversity rerank (operators/similarity.mmr_rerank) vs a pure
python reference, plus the diversity property the operator exists for."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.similarity import (
    brute_force_topk,
    mmr_rerank,
)

# corpus: two tight clusters + one outlier; queries near cluster A
VECS = {
    1: [1.0, 0.0, 0.0],
    2: [0.99, 0.14, 0.0],   # near-dup of 1
    3: [0.98, 0.0, 0.2],    # near-dup of 1
    4: [0.0, 1.0, 0.0],     # different direction
    5: [0.0, 0.0, 1.0],     # different direction
}
QUERY = [1.0, 0.05, 0.05]
LAM = 0.3


def _py_mmr(cands, k):
    """cands: list of (id, rel). Greedy MMR with cosine redundancy."""
    unit = {i: np.array(v) / np.linalg.norm(v) for i, v in VECS.items()}
    chosen, rest = [], list(cands)
    while rest and len(chosen) < k:
        def mmr(c):
            red = max(
                (float(unit[c[0]] @ unit[s[0]]) for s in chosen),
                default=0.0,
            )
            return LAM * c[1] - (1 - LAM) * red

        best = max(rest, key=lambda c: (mmr(c), -c[0]))
        chosen.append(best)
        rest.remove(best)
    return [c[0] for c in chosen]


def test_mmr_matches_reference_and_diversifies(spark):
    corpus = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()], ["vec_id", "embedding"]
    )
    queries = spark.createDataFrame(
        [(100, QUERY)], ["vec_id", "embedding"]
    )
    short = brute_force_topk(corpus, queries, k=5)
    cands = [
        (r["neighbor_id"], r["cosine"])
        for r in short.orderBy(F.desc("cosine")).collect()
    ]
    # plain top-3 is the redundant trio {1, 2, 3}
    assert {c[0] for c in cands[:3]} == {1, 2, 3}
    got = (
        mmr_rerank(short, corpus, k=3, lam=LAM)
        .orderBy("mmr_rank")
        .collect()
    )
    want = _py_mmr(cands, 3)
    assert [r["neighbor_id"] for r in got] == want
    # the property: after the best hit, MMR swaps a near-dup for a
    # different-direction doc
    assert got[0]["neighbor_id"] == 1
    assert {r["neighbor_id"] for r in got} != {1, 2, 3}
    assert [r["mmr_rank"] for r in got] == [1, 2, 3]


def test_mmr_lam1_is_plain_ranking(spark):
    corpus = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()], ["vec_id", "embedding"]
    )
    queries = spark.createDataFrame([(100, QUERY)], ["vec_id", "embedding"])
    short = brute_force_topk(corpus, queries, k=5)
    got = (
        mmr_rerank(short, corpus, k=3, lam=1.0)
        .orderBy("mmr_rank")
        .collect()
    )
    plain = [
        r["neighbor_id"]
        for r in short.orderBy(F.desc("cosine"), "neighbor_id").collect()
    ][:3]
    assert [r["neighbor_id"] for r in got] == plain
    with pytest.raises(ValueError):
        mmr_rerank(short, corpus, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(short, corpus, lam=1.5)


def test_mmr_string_ids(spark):
    """String-keyed corpora work end to end (review finding: the output
    schema previously hardcoded LongType and the tie-break int()-cast
    the ids)."""
    corpus = spark.createDataFrame(
        [(f"doc-{i}", v) for i, v in VECS.items()], ["vec_id", "embedding"]
    )
    cands = spark.createDataFrame(
        [("q-1", f"doc-{i}", float(np.dot(QUERY, v) /
          (np.linalg.norm(QUERY) * np.linalg.norm(v))))
         for i, v in VECS.items()],
        ["query_id", "neighbor_id", "cosine"],
    )
    got = mmr_rerank(cands, corpus, k=3, lam=LAM).orderBy("mmr_rank").collect()
    assert [r["neighbor_id"] for r in got][0] == "doc-1"
    assert len(got) == 3 and got[0]["query_id"] == "q-1"

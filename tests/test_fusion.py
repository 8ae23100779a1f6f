"""Rank fusion (operators/fusion): RRF + weighted-score hybrid
retrieval combiners.  Cross-engine parity: tools/extra_oracles::x_rrf."""

from __future__ import annotations

import pytest

from qualityassurancetool_spark.operators.fusion import (
    rrf_fuse,
    weighted_score_fuse,
)


def _shortlist(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, score double"
    )


def test_fusion_of_identical_rankings_is_the_ranking(spark):
    """Property: RRF of N copies of one ranking preserves its order
    exactly (every doc's fused score is N·(1/(c+rank)) — strictly
    decreasing in rank)."""
    ranking = _shortlist(
        spark,
        [(1, 10, 9.0), (1, 11, 5.0), (1, 12, 3.0), (1, 13, 1.0),
         (2, 20, 2.0), (2, 21, 1.0)],
    )
    fused = rrf_fuse(
        {"a": ranking, "b": ranking, "c": ranking}, k=10
    ).collect()
    order = {
        q: [r["doc_id"] for r in sorted(
            (x for x in fused if x["query_id"] == q),
            key=lambda x: (-x["rrf_score"], x["doc_id"]),
        )]
        for q in (1, 2)
    }
    assert order[1] == [10, 11, 12, 13]
    assert order[2] == [20, 21]
    assert all(r["n_sources"] == 3 for r in fused)
    # weighted-score fusion of identical rankings preserves order too
    wfused = weighted_score_fuse({"a": ranking, "b": ranking}).collect()
    worder = [
        r["doc_id"]
        for r in sorted(
            (x for x in wfused if x["query_id"] == 1),
            key=lambda x: (-x["fused_score"], x["doc_id"]),
        )
    ]
    assert worder == [10, 11, 12, 13]


def test_rrf_consensus_beats_single_list_heads(spark):
    """A doc on BOTH shortlists at rank 2 outscores docs that are rank 1
    on only one list (1/62+1/62 > 1/61): the consensus property that
    makes RRF the hybrid default."""
    sparse = _shortlist(spark, [(1, 100, 9.0), (1, 7, 5.0), (1, 101, 2.0)])
    dense = _shortlist(spark, [(1, 200, 0.99), (1, 7, 0.80), (1, 201, 0.5)])
    fused = rrf_fuse({"bm25": sparse, "ann": dense}, k=10).collect()
    best = max(fused, key=lambda r: r["rrf_score"])
    assert best["doc_id"] == 7 and best["n_sources"] == 2


def test_rrf_ranks_rederived_not_trusted(spark):
    """Ranks come from (score desc, id asc), never input row order —
    shuffling the input rows changes nothing."""
    rows = [(1, 10, 1.0), (1, 11, 9.0), (1, 12, 5.0)]
    a = rrf_fuse({"s": _shortlist(spark, rows)}).collect()
    b = rrf_fuse({"s": _shortlist(spark, rows[::-1])}).collect()
    key = lambda r: (r["query_id"], r["doc_id"])  # noqa: E731
    assert sorted(map(tuple, a), key=None) == sorted(map(tuple, b), key=None)
    top = max(a, key=lambda r: r["rrf_score"])
    assert top["doc_id"] == 11  # highest score, not first row


def test_rrf_weights_and_validation(spark):
    sparse = _shortlist(spark, [(1, 10, 9.0), (1, 11, 5.0)])
    dense = _shortlist(spark, [(1, 11, 0.9), (1, 10, 0.5)])
    # heavy dense weight flips the winner to the dense head
    fused = rrf_fuse(
        {"s": sparse, "d": dense}, weights={"d": 10.0}, k=1
    ).collect()
    assert fused[0]["doc_id"] == 11
    with pytest.raises(ValueError, match="unknown shortlists"):
        rrf_fuse({"s": sparse}, weights={"nope": 1.0})
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse({})
    with pytest.raises(ValueError, match="positive"):
        rrf_fuse({"s": sparse}, c=0.0)


def test_weighted_score_fuse_degenerate_and_missing(spark):
    """Min-max with a constant list normalizes to 1.0 (not NaN); docs
    missing from one system just lose that contribution."""
    flat = _shortlist(spark, [(1, 10, 3.0), (1, 11, 3.0)])
    other = _shortlist(spark, [(1, 10, 1.0)])
    fused = {
        r["doc_id"]: (r["fused_score"], r["n_sources"])
        for r in weighted_score_fuse({"f": flat, "o": other}).collect()
    }
    assert fused[10] == (pytest.approx(2.0), 2)  # 1.0 flat + 1.0 only-doc
    assert fused[11] == (pytest.approx(1.0), 1)

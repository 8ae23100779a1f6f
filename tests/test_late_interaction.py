"""MaxSim late-interaction rerank (operators/late_interaction):
hand-computed scores, single-token degeneration to plain dot product,
permutation invariance over doc tokens, shortlist discipline."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.late_interaction import (
    maxsim_rerank,
    maxsim_score,
    split_tokens,
)


def _df(spark, rows, idcol):
    return spark.createDataFrame(rows, [idcol, "token_vecs"])


def test_hand_computed_score(spark):
    # q tokens: [1,0], [0,1]; d tokens: [2,0], [0,3], [1,1]
    # token1 best dot = 2 (with [2,0]); token2 best = 3 (with [0,3])
    q = _df(spark, [(1, [[1.0, 0.0], [0.0, 1.0]])], "query_id")
    d = _df(spark, [(7, [[2.0, 0.0], [0.0, 3.0], [1.0, 1.0]])], "doc_id")
    sl = spark.createDataFrame([(1, 7)], ["query_id", "doc_id"])
    row = maxsim_rerank(sl, q, d, k=5).collect()[0]
    assert row.maxsim == pytest.approx(5.0)
    assert row.rank == 1


def test_single_token_is_plain_dot(spark):
    q = _df(spark, [(1, [[1.0, 2.0, 3.0]])], "query_id")
    d = _df(spark, [(7, [[4.0, 5.0, 6.0]])], "doc_id")
    sl = spark.createDataFrame([(1, 7)], ["query_id", "doc_id"])
    row = maxsim_rerank(sl, q, d, k=1).collect()[0]
    assert row.maxsim == pytest.approx(4 + 10 + 18)


def test_doc_token_order_irrelevant(spark):
    toks = [[1.0, 0.0], [0.5, 0.5], [0.0, 2.0]]
    q = _df(spark, [(1, [[1.0, 1.0]])], "query_id")
    d1 = _df(spark, [(7, toks)], "doc_id")
    d2 = _df(spark, [(7, toks[::-1])], "doc_id")
    sl = spark.createDataFrame([(1, 7)], ["query_id", "doc_id"])
    s1 = maxsim_rerank(sl, q, d1, k=1).collect()[0].maxsim
    s2 = maxsim_rerank(sl, q, d2, k=1).collect()[0].maxsim
    assert s1 == pytest.approx(s2)


def test_rerank_orders_and_limits(spark):
    q = _df(spark, [(1, [[1.0, 0.0]])], "query_id")
    docs = _df(
        spark,
        [
            (10, [[0.1, 9.0]]),
            (11, [[0.5, 0.0]]),
            (12, [[0.9, 0.0]]),
            (13, [[0.3, 0.0]]),
        ],
        "doc_id",
    )
    sl = spark.createDataFrame(
        [(1, d) for d in (10, 11, 12, 13)], ["query_id", "doc_id"]
    )
    got = maxsim_rerank(sl, q, docs, k=2).orderBy("rank").collect()
    assert [r.doc_id for r in got] == [12, 11]
    # only shortlisted docs are ever scored
    sl_partial = spark.createDataFrame([(1, 13)], ["query_id", "doc_id"])
    only = maxsim_rerank(sl_partial, q, docs, k=5).collect()
    assert [r.doc_id for r in only] == [13]


def test_tie_break_on_doc_id(spark):
    q = _df(spark, [(1, [[1.0]])], "query_id")
    docs = _df(spark, [(21, [[2.0]]), (20, [[2.0]])], "doc_id")
    sl = spark.createDataFrame(
        [(1, 20), (1, 21)], ["query_id", "doc_id"]
    )
    got = maxsim_rerank(sl, q, docs, k=2).orderBy("rank").collect()
    assert [r.doc_id for r in got] == [20, 21]


def test_split_tokens(spark):
    df = spark.createDataFrame(
        [(1, [float(i) for i in range(8)])], ["id", "v"]
    )
    out = df.select(
        split_tokens(F.col("v"), 4, 8).alias("t")
    ).collect()[0]
    assert out.t == [[0.0, 1.0], [2.0, 3.0], [4.0, 5.0], [6.0, 7.0]]
    with pytest.raises(ValueError):
        split_tokens(F.col("v"), 3, 8)


def test_maxsim_score_column_usable_standalone(spark):
    df = spark.createDataFrame(
        [([[1.0, 0.0]], [[0.0, 1.0], [3.0, 0.0]])], ["q", "d"]
    )
    got = df.select(
        maxsim_score(F.col("q"), F.col("d")).alias("s")
    ).collect()[0]
    assert got.s == pytest.approx(3.0)


def test_k_validation(spark):
    q = _df(spark, [(1, [[1.0]])], "query_id")
    sl = spark.createDataFrame([(1, 1)], ["query_id", "doc_id"])
    with pytest.raises(ValueError):
        maxsim_rerank(sl, q, q.withColumnRenamed("query_id", "doc_id"), k=0)


def test_duplicate_shortlist_pairs_score_once(spark):
    # the round-11 slim-broadcast restructure moved the distinct()
    # BEFORE the joins: a multi-probe shortlist repeating a pair must
    # still occupy exactly one rank slot, and a shortlist pair whose
    # query has no matrix row must drop (inner-join semantics preserved
    # across the restructure)
    q = _df(spark, [(1, [[1.0, 0.0], [0.0, 1.0]])], "query_id")
    docs = _df(
        spark,
        [(10, [[2.0, 0.0], [0.0, 3.0]]), (11, [[1.0, 0.0], [0.0, 1.0]])],
        "doc_id",
    )
    sl = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 11), (2, 10)], ["query_id", "doc_id"]
    )
    got = maxsim_rerank(sl, q, docs, k=5).orderBy("rank").collect()
    assert [(r.query_id, r.doc_id, r.rank) for r in got] == [
        (1, 10, 1),
        (1, 11, 2),
    ]

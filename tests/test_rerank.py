"""Exact rerank of ANN shortlists (operators/similarity.exact_rerank)."""

import random

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.similarity import (
    brute_force_topk,
    exact_rerank,
)


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(4)
    corpus = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(400)],
        "vec_id long, embedding array<double>",
    ).persist()
    queries = corpus.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return corpus, queries


def test_rerank_of_exact_shortlist_is_exact_topk(spark, data):
    """Reranking a shortlist that CONTAINS the true top-k must return
    exactly the brute-force answer (same metric, same tie-break)."""
    corpus, queries = data
    truth = brute_force_topk(
        corpus, queries.withColumnRenamed("query_id", "vec_id"), k=5
    )
    shortlist = brute_force_topk(
        corpus, queries.withColumnRenamed("query_id", "vec_id"), k=40
    ).select("query_id", "neighbor_id")
    got = exact_rerank(shortlist, corpus, queries, k=5, metric="cosine")
    t = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    g = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    assert g == t


def test_rerank_fixes_corrupted_ranking(spark, data):
    """A shortlist in ARBITRARY order (even with junk candidates) comes
    back correctly ranked — the operator must not trust input order."""
    corpus, queries = data
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(
            corpus, queries.withColumnRenamed("query_id", "vec_id"), k=3
        ).collect()
    }
    # shortlist = true top-30 plus 20 junk ids, shuffled
    short = brute_force_topk(
        corpus, queries.withColumnRenamed("query_id", "vec_id"), k=30
    ).select("query_id", "neighbor_id")
    junk = queries.select("query_id").crossJoin(
        corpus.select(F.col("vec_id").alias("neighbor_id")).where(
            F.col("neighbor_id") % 17 == 3
        )
    )
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in exact_rerank(
            short.union(junk).distinct(), corpus, queries, k=3
        ).collect()
    }
    # junk can only ADD candidates, so the true top-3 still wins unless
    # a junk id IS a true top-3 member (fine either way: sets equal)
    assert got == truth


def test_l2_metric_and_k_rows(spark, data):
    corpus, queries = data
    short = brute_force_topk(
        corpus, queries.withColumnRenamed("query_id", "vec_id"), k=20
    ).select("query_id", "neighbor_id")
    out = exact_rerank(short, corpus, queries, k=4, metric="l2")
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 4 for r in counts)
    assert "l2_dist" in out.columns
    with pytest.raises(ValueError):
        exact_rerank(short, corpus, queries, metric="dot")


def test_l2_normalize(spark):
    from qualityassurancetool_spark.operators.similarity import (
        l2_normalize,
        l2_norm,
    )

    df = spark.createDataFrame(
        [(0, [3.0, 4.0]), (1, [0.0, 0.0]), (2, [0.0, -2.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["embedding"] for r in l2_normalize(df).collect()}
    assert got[0] == pytest.approx([0.6, 0.8])
    assert got[1] == [0.0, 0.0]  # zero vector passes through
    assert got[2] == pytest.approx([0.0, -1.0])
    # out_col mode keeps the original column
    out = l2_normalize(df, out_col="unit")
    assert set(out.columns) == {"vec_id", "embedding", "unit"}

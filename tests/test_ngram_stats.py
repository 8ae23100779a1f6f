"""Frequent n-grams / boilerplate discovery (operators/ngram_stats).
Cross-engine parity: tools/extra_oracles.py::x_ngram_topk."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.ngram_stats import (
    boilerplate_grams,
    doc_kgrams,
    top_kgrams,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_doc_kgrams_distinct_per_doc(spark):
    df = _df(spark, [(1, "a b a b a b")])  # "a b a" twice, "b a b" twice
    grams = [r["gram"] for r in doc_kgrams(df, k=3).collect()]
    assert sorted(grams) == ["a b a", "b a b"]  # distinct per doc


def test_top_kgrams_ranks_by_doc_frequency(spark):
    boiler = "all rights reserved worldwide"
    df = _df(
        spark,
        [(i, f"unique words {i} only here plus {boiler}") for i in range(6)]
        + [(99, "totally different content entirely")],
    )
    top = top_kgrams(df, k=3, top=3).collect()
    assert top[0]["n_docs"] == 6
    assert top[0]["gram"] in {
        "all rights reserved",
        "rights reserved worldwide",
    }
    # deterministic total order: ties broken by gram ascending
    pairs = [(r["n_docs"], r["gram"]) for r in top]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_boilerplate_grams_threshold(spark):
    df = _df(
        spark,
        [(i, f"doc body {i} text cookie policy applies here") for i in range(10)]
        + [
            (100 + i, f"alpha{i} beta{i} gamma{i} delta{i}")
            for i in range(10)
        ],
    )
    hits = boilerplate_grams(df, k=3, min_doc_fraction=0.4).collect()
    grams = {r["gram"] for r in hits}
    assert "cookie policy applies" in grams
    assert all(r["doc_fraction"] >= 0.4 for r in hits)
    # nothing from the clean half (every 3-gram there is doc-unique)
    assert not any("alpha" in g for g in grams)


def test_unsupported_ranking_guard(spark):
    with pytest.raises(ValueError):
        top_kgrams(_df(spark, [(1, "a b c")]), by="tf")


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert top_kgrams(empty, top=5).count() == 0
    assert boilerplate_grams(empty).count() == 0
    # empty TEXT contributes nothing either
    assert doc_kgrams(_df(spark, [(1, "")]), k=3).count() == 0

"""Connected components (operators/components) and benchmark
decontamination (operators/decontam) unit tests."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.components import (
    connected_components,
)
from qualityassurancetool_spark.operators.decontam import (
    benchmark_ngram_overlap,
    doc_gram_hashes,
)


def _cc_dict(spark, pairs, strategy="auto"):
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    out = connected_components(df, strategy=strategy)
    return {r["id"]: r["component"] for r in out.collect()}


@pytest.mark.parametrize("strategy", ["local", "distributed"])
def test_cc_two_components(spark, strategy):
    # {1,2,3} via chain, {10,11} separate
    got = _cc_dict(spark, [(1, 2), (2, 3), (10, 11)], strategy)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


@pytest.mark.parametrize("strategy", ["local", "distributed"])
def test_cc_long_chain_converges(spark, strategy):
    # path graph 0-1-2-...-12: diameter >> 2, exercises pointer jumping
    pairs = [(i, i + 1) for i in range(12)]
    got = _cc_dict(spark, pairs, strategy)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_cc_cycle_and_order_invariance(spark):
    # same component regardless of pair orientation / duplicates
    got = _cc_dict(spark, [(5, 4), (4, 5), (3, 5), (2, 3), (2, 2)])
    assert got == {2: 2, 3: 2, 4: 2, 5: 2}


def test_cc_strategies_agree_on_random_graph(spark):
    import random

    rng = random.Random(11)
    pairs = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(45)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _cc_dict(spark, pairs, "local") == _cc_dict(
        spark, pairs, "distributed"
    )


def test_cc_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_cc_matches_bruteforce_on_random_graph(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(40))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(30)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _cc_dict(spark, pairs)

    # driver-side union-find oracle
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    in_pairs = {x for p in pairs for x in p}
    want = {
        n: min(m for m in in_pairs if find(m) == find(n))
        for n in in_pairs
    }
    assert got == want


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a completely different sentence with no shared phrases"),
    (3, "the quick brown fox runs home fast tonight"),
    (4, "unrelated text about spark physical plans and shuffles"),
]


def test_decontam_overlap_counts(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = docs.where(F.col("doc_id") == 1)
    train = docs.where(F.col("doc_id") != 1)
    out = benchmark_ngram_overlap(train, bench, k=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 3 shares exactly 'the quick brown' and 'quick brown fox'
    assert set(rows) == {3}
    assert rows[3]["n_overlap"] == 2
    assert rows[3]["n_grams"] == 6
    assert rows[3]["overlap_frac"] == pytest.approx(2 / 6, abs=1e-6)


def test_decontam_no_false_positives(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = docs.where(F.col("doc_id") == 4)
    train = docs.where(F.col("doc_id").isin(1, 2))
    assert benchmark_ngram_overlap(train, bench, k=3).count() == 0


def test_gram_hashes_distinct_and_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a b")], ["doc_id", "text"]
    )
    g1 = doc_gram_hashes(docs, 2).collect()[0]["_gs"]
    g2 = doc_gram_hashes(docs, 2).collect()[0]["_gs"]
    assert sorted(g1) == sorted(g2)
    # 'a b a b a b' 2-grams: 'a b', 'b a' → 2 distinct
    assert len(g1) == len(set(g1)) == 2

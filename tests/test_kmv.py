"""KMV bottom-k sketch (operators/kmv): estimator accuracy, exact
small-set behavior, merge/union algebra, pairwise Jaccard vs true
Jaccard, and the partition-prune path's equivalence."""

import math

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.kmv import (
    kmv_estimate,
    kmv_estimate_by,
    kmv_merge,
    kmv_set_compare,
    kmv_sketch,
    kmv_sketch_by,
)

K = 256


def _keys(spark, lo, hi, prefix="k", part=8):
    return (
        spark.range(lo, hi)
        .select(F.concat(F.lit(prefix), F.col("id")).alias("k"))
        .repartition(part)
    )


def test_estimate_accuracy(spark):
    # sigma/D ~ 1/sqrt(k-2) ~ 6.3% at k=256; allow 4 sigma
    for n in (1000, 20000):
        est = kmv_estimate(
            kmv_sketch(_keys(spark, 0, n), "k", k=K), k=K
        ).collect()[0]
        assert abs(est.est_distinct - n) / n < 4 / math.sqrt(K - 2)


def test_small_set_is_exact(spark):
    est = kmv_estimate(
        kmv_sketch(_keys(spark, 0, 100), "k", k=K), k=K
    ).collect()[0]
    assert est.n_hashes == 100 and est.est_distinct == 100.0


def test_prune_path_identical(spark):
    df = _keys(spark, 0, 5000, part=16)
    a = sorted(r.h for r in kmv_sketch(df, "k", k=K, prune=True).collect())
    b = sorted(r.h for r in kmv_sketch(df, "k", k=K, prune=False).collect())
    assert a == b and len(a) == K


def test_prune_survives_heavy_duplication(spark):
    # one partition holding K copies of a single key plus K unique
    # keys: a row_number prune would fill its slots with copies and
    # evict distinct values; the dense_rank prune must not.
    dup = spark.range(K).select(F.lit("dup").alias("k"))
    uniq = _keys(spark, 0, K)
    df = dup.unionByName(uniq).coalesce(1)
    a = sorted(r.h for r in kmv_sketch(df, "k", k=K, prune=True).collect())
    b = sorted(r.h for r in kmv_sketch(df, "k", k=K, prune=False).collect())
    assert a == b and len(a) == K


def test_grouped_prune_survives_heavy_duplication(spark):
    dup = spark.range(64).select(
        F.lit("g1").alias("g"), F.lit("dup").alias("k")
    )
    uniq = _keys(spark, 0, 200).select(F.lit("g1").alias("g"), "k")
    df = dup.unionByName(uniq).coalesce(1)
    got = sorted(
        r.h for r in kmv_sketch_by(df, ["g"], "k", k=64).collect()
    )
    want = sorted(
        r.h for r in kmv_sketch(df, "k", k=64, prune=False).collect()
    )
    assert got == want


def test_duplicates_ignored(spark):
    base = _keys(spark, 0, 800)
    trip = base.unionByName(base).unionByName(base)
    a = sorted(r.h for r in kmv_sketch(base, "k", k=K).collect())
    b = sorted(r.h for r in kmv_sketch(trip, "k", k=K).collect())
    assert a == b


def test_merge_is_union_sketch(spark):
    a, b = _keys(spark, 0, 2000), _keys(spark, 1000, 3000)
    merged = sorted(
        r.h
        for r in kmv_merge(
            kmv_sketch(a, "k", k=K), kmv_sketch(b, "k", k=K), k=K
        ).collect()
    )
    direct = sorted(
        r.h
        for r in kmv_sketch(a.unionByName(b), "k", k=K).collect()
    )
    assert merged == direct


def test_grouped_matches_solo(spark):
    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("v"), (F.col("id") % 700)).alias("k"),
    )
    by = kmv_sketch_by(df, ["g"], "k", k=64)
    ests = {r.g: r for r in kmv_estimate_by(by, ["g"], k=64).collect()}
    for g in "012":
        solo = kmv_estimate(
            kmv_sketch(df.where(F.col("g") == g), "k", k=64), k=64
        ).collect()[0]
        assert (ests[g].n_hashes, ests[g].kth_hash) == (
            solo.n_hashes,
            solo.kth_hash,
        )


def test_pairwise_jaccard_tracks_truth(spark):
    # A = [0, 2000), B = [1000, 3000): true J = 1000/3000 = 1/3
    df = _keys(spark, 0, 2000).select(F.lit("A").alias("g"), "k").unionByName(
        _keys(spark, 1000, 3000).select(F.lit("B").alias("g"), "k")
    )
    sk = kmv_sketch_by(df, ["g"], "k", k=K)
    row = kmv_set_compare(sk, "g", k=K).collect()[0]
    assert (row.ga, row.gb) == ("A", "B")
    assert abs(row.jaccard - 1 / 3) < 4 * math.sqrt((1 / 3) * (2 / 3) / K)
    assert abs(row.est_union - 3000) / 3000 < 4 / math.sqrt(K - 2)


def test_pairwise_exact_when_small(spark):
    # both sets tiny -> union sample is the whole union: exact numbers
    df = _keys(spark, 0, 30).select(F.lit("A").alias("g"), "k").unionByName(
        _keys(spark, 20, 50).select(F.lit("B").alias("g"), "k")
    )
    sk = kmv_sketch_by(df, ["g"], "k", k=K)
    row = kmv_set_compare(sk, "g", k=K).collect()[0]
    assert row.n_union_sample == 50 and row.n_both == 10
    assert row.jaccard == pytest.approx(10 / 50)
    assert row.est_union == 50.0


def test_identical_groups_jaccard_one(spark):
    df = _keys(spark, 0, 1500).select(F.lit("A").alias("g"), "k").unionByName(
        _keys(spark, 0, 1500).select(F.lit("B").alias("g"), "k")
    )
    row = kmv_set_compare(
        kmv_sketch_by(df, ["g"], "k", k=K), "g", k=K
    ).collect()[0]
    assert row.jaccard == 1.0


def test_disjoint_groups_jaccard_zero(spark):
    df = _keys(spark, 0, 1000).select(F.lit("A").alias("g"), "k").unionByName(
        _keys(spark, 5000, 6000).select(F.lit("B").alias("g"), "k")
    )
    row = kmv_set_compare(
        kmv_sketch_by(df, ["g"], "k", k=K), "g", k=K
    ).collect()[0]
    assert row.jaccard == 0.0


def test_nulls_dropped_and_validation(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], ["k"])
    assert kmv_sketch(df, "k", k=4).count() == 2
    with pytest.raises(ValueError):
        kmv_sketch(df, "k", k=1)

"""Two-pass exact heavy hitters (operators/heavy_hitters).
Cross-engine parity: tools/extra_oracles.py::x_heavy_hitters."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.heavy_hitters import (
    heavy_hitters,
    mg_candidates,
    token_heavy_hitters,
)


def _stream(spark, pairs):
    """pairs = [(key, count)] → one row per occurrence, interleaved and
    spread over several partitions so the MG kernel sees mixed runs."""
    rows = [(k,) for k, c in pairs for _ in range(c)]
    return (
        spark.createDataFrame(rows, ["k"])
        .withColumn("_h", F.xxhash64("k", F.monotonically_increasing_id()))
        .repartition(8, "_h")
        .drop("_h")
    )


def test_exact_vs_groupby(spark):
    pairs = [("hot", 400), ("warm", 120), ("meh", 40)] + [
        (f"cold{i}", 1) for i in range(440)
    ]
    df = _stream(spark, pairs)  # total = 1000
    got = {
        r["k"]: r["n"]
        for r in heavy_hitters(df, "k", min_fraction=0.05).collect()
    }
    # exact answer: every key with count >= 50
    assert got == {"hot": 400, "warm": 120}


def test_candidates_are_superset_at_minimal_capacity(spark):
    # 1/min_fraction = 20 → capacity 20 must still catch the heavy keys
    pairs = [("a", 300), ("b", 100)] + [(f"z{i}", 2) for i in range(300)]
    df = _stream(spark, pairs)
    cand = {r["k"] for r in mg_candidates(df, "k", capacity=20).collect()}
    assert {"a", "b"} <= cand


def test_threshold_boundary_inclusive(spark):
    # exactly total * min_fraction must be KEPT (>= semantics, matching
    # the oracle's HAVING)
    pairs = [("edge", 10), ("under", 9)] + [(f"f{i}", 1) for i in range(81)]
    df = _stream(spark, pairs)  # total = 100, f=0.1 → threshold 10
    got = {r["k"] for r in heavy_hitters(df, "k", min_fraction=0.1).collect()}
    assert got == {"edge"}


def test_nulls_ignored_everywhere(spark):
    df = spark.createDataFrame(
        [("x",)] * 6 + [(None,)] * 90 + [("y",)] * 4, ["k"]
    )
    # total counts only non-null rows (10), so x=6 passes f=0.5
    got = {
        r["k"]: r["n"]
        for r in heavy_hitters(df, "k", min_fraction=0.5).collect()
    }
    assert got == {"x": 6}


def test_capacity_below_floor_rejected(spark):
    df = _stream(spark, [("a", 5)])
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", min_fraction=0.01, capacity=50)
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", min_fraction=0.0)
    with pytest.raises(ValueError):
        mg_candidates(df, "k", capacity=0)


def test_token_heavy_hitters_tokenization(spark):
    docs = spark.createDataFrame(
        [
            (1, "The  THE the quick fox"),
            (2, "the lazy dog and the cat"),
        ],
        ["doc_id", "text"],
    )
    # token stream: 11 tokens, 'the' appears 5x (case-folded, collapsed)
    got = {
        r["token"]: r["n"]
        for r in token_heavy_hitters(docs, min_fraction=0.4).collect()
    }
    assert got == {"the": 5}


def test_nan_keys_excluded_consistently(spark):
    """NaN double keys must be excluded from BOTH passes (pandas
    value_counts drops NaN, so counting them in the total would break
    the exactness guarantee — review finding)."""
    rows = [(1.5,)] * 6 + [(float("nan"),)] * 90 + [(2.5,)] * 4
    df = spark.createDataFrame(rows, "k double")
    got = {
        r["k"]: r["n"]
        for r in heavy_hitters(df, "k", min_fraction=0.5).collect()
    }
    # total counts only the 10 non-NaN rows → 1.5 (6/10) passes f=0.5
    assert got == {1.5: 6}


def test_threshold_boundary_float_artifact(spark):
    # total=100, min_fraction=0.07: 100*0.07 = 7.000000000000001 in
    # float, which used to exclude a key at exactly the documented 7%
    # share.  The rational threshold (7/100) keeps it (ADVICE r3).
    pairs = [("edge", 7), ("under", 6)] + [(f"f{i}", 1) for i in range(87)]
    df = _stream(spark, pairs)  # total = 100
    got = {r["k"] for r in heavy_hitters(df, "k", min_fraction=0.07).collect()}
    assert got == {"edge"}


def test_tiny_fraction_rejected_not_silently_disabled(spark):
    # below rational resolution the threshold would degrade to n >= 0
    # (review finding); reject loudly instead
    df = _stream(spark, [("a", 5)])
    with pytest.raises(ValueError, match="resolution"):
        heavy_hitters(df, "k", min_fraction=1e-13)


def _gstream(spark, triples):
    """triples = [(group, key, count)] → one row per occurrence,
    spread over partitions."""
    rows = [(g, k) for g, k, c in triples for _ in range(c)]
    return (
        spark.createDataFrame(rows, ["g", "k"])
        .withColumn("_h", F.xxhash64("k", F.monotonically_increasing_id()))
        .repartition(8, "_h")
        .drop("_h")
    )


def test_grouped_exact_vs_groupby(spark):
    from qualityassurancetool_spark.operators.heavy_hitters import (
        heavy_hitters_by,
    )

    data = [
        ("en", "the", 400), ("en", "of", 150), ("en", "rare", 3),
        ("de", "der", 80), ("de", "und", 15), ("de", "x", 5),
    ]
    df = _gstream(spark, data)
    got = {
        (r.g, r.k): r.n
        for r in heavy_hitters_by(df, ["g"], "k", 0.1).collect()
    }
    # exact per-group truth
    want = {}
    totals = {}
    for g, k, c in data:
        totals[g] = totals.get(g, 0) + c
    for g, k, c in data:
        if c * 10 >= totals[g]:  # share >= 0.1, integer-exact
            want[(g, k)] = c
    assert got == want
    # 'und' is 15% of de (heavy there) but would be far under 10% of
    # the en-dominated global stream: per-group semantics confirmed
    assert ("de", "und") in got


def test_grouped_threshold_boundary_inclusive(spark):
    from qualityassurancetool_spark.operators.heavy_hitters import (
        heavy_hitters_by,
    )

    # exactly at the share: 7 of 100 with min_fraction=0.07
    data = [("a", "hot", 7), ("a", "cold", 93)]
    got = heavy_hitters_by(
        _gstream(spark, data), ["g"], "k", 0.07
    ).collect()
    assert ("a", "hot", 7) in [(r.g, r.k, r.n) for r in got]


def test_grouped_null_group_and_key_excluded(spark):
    from qualityassurancetool_spark.operators.heavy_hitters import (
        heavy_hitters_by,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", None), (None, "x"), ("b", "y")],
        ["g", "k"],
    )
    got = {(r.g, r.k): r.n for r in
           heavy_hitters_by(df, ["g"], "k", 0.5).collect()}
    # null key doesn't count toward a's total (x is 2 of 2); null
    # group stratum is excluded entirely
    assert got == {("a", "x"): 2, ("b", "y"): 1}


def test_grouped_validation(spark):
    from qualityassurancetool_spark.operators.heavy_hitters import (
        heavy_hitters_by,
    )

    df = _gstream(spark, [("a", "x", 2)])
    with pytest.raises(ValueError, match="group_cols"):
        heavy_hitters_by(df, [], "k", 0.1)
    with pytest.raises(ValueError, match="min_fraction"):
        heavy_hitters_by(df, ["g"], "k", 0.0)
    with pytest.raises(ValueError, match="superset"):
        heavy_hitters_by(df, ["g"], "k", 0.1, capacity=2)

"""Winnowing document fingerprints (operators/fingerprint.py):
the paper's guarantee property, density bound, and copy detection on
planted duplicates."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.fingerprint import (
    chargram_hashes,
    document_fingerprints,
    fingerprint_overlap_pairs,
    winnow,
)

K, W = 20, 8


def _rand_text(rng: random.Random, n_words: int) -> str:
    return " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(3, 9)))
        for _ in range(n_words)
    )


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = document_fingerprints(df, k=K, w=W)
    res: dict[int, set[int]] = {}
    for r in out.collect():
        res.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    return res


def test_winnowing_guarantee_shared_substring(spark):
    """Any shared substring of length >= k + w - 1 must yield at least
    one shared fingerprint (Schleimer et al. theorem 1)."""
    rng = random.Random(7)
    shared = _rand_text(rng, 12)  # ~70 chars >> k + w - 1 = 27
    rows = [
        (1, _rand_text(rng, 40) + " " + shared + " " + _rand_text(rng, 40)),
        (2, _rand_text(rng, 30) + " " + shared + " " + _rand_text(rng, 25)),
    ]
    fps = _fps(spark, rows)
    assert fps[1] & fps[2], "planted shared substring produced no shared fingerprint"


def test_winnowing_density_and_short_docs(spark):
    """Fingerprint count is ~2/(w+1) of gram count (paper's expected
    density) and short docs degrade gracefully."""
    rng = random.Random(3)
    long_text = _rand_text(rng, 400)
    rows = [
        (1, long_text),
        (2, "tiny"),              # < k chars: no grams, no fingerprints
        (3, "x" * (K + 2)),       # grams exist but fewer than w: 1 window
        (4, ""),
    ]
    fps = _fps(spark, rows)
    n_grams = len(" ".join(long_text.split())) - K + 1
    density = len(fps[1]) / n_grams
    # expected 2/(w+1) ~ 0.22; distinct-set collapse only lowers it
    assert 0.05 < density < 0.5
    assert 2 not in fps and 4 not in fps
    assert len(fps[3]) == 1  # degenerate single window, all-equal grams


def test_identical_docs_full_containment(spark):
    rng = random.Random(11)
    t = _rand_text(rng, 120)
    df = spark.createDataFrame(
        [(1, t), (2, t), (3, _rand_text(rng, 120))],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r
        for r in fingerprint_overlap_pairs(df, k=K, w=W).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["containment"] == 1.0


def test_max_df_drops_boilerplate(spark):
    """A fingerprint present in every doc is excluded by the frequency
    cap, so all-boilerplate docs yield no pairs."""
    rng = random.Random(5)
    boiler = _rand_text(rng, 30)
    rows = [(i, boiler + " " + _rand_text(rng, 50)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # max_df=1: every shared fingerprint (df >= 2) is dropped -> no pairs
    assert fingerprint_overlap_pairs(df, k=K, w=W, max_df=1).count() == 0
    # permissive cap: the boilerplate makes every pair a candidate
    assert fingerprint_overlap_pairs(df, k=K, w=W, max_df=100).count() > 0


def test_fast_mode_same_pair_structure(spark):
    """xxhash64 fast mode finds the same planted duplicate (hash values
    differ; the detected structure must not)."""
    rng = random.Random(2)
    t = _rand_text(rng, 100)
    df = spark.createDataFrame(
        [(1, t), (2, t), (3, _rand_text(rng, 100))],
        "doc_id long, text string",
    )
    for mode in ("portable", "fast"):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in fingerprint_overlap_pairs(
                df, k=K, w=W, hash_mode=mode
            ).collect()
        }
        assert got == {(1, 2)}, mode


def test_plan_has_no_python_stage(spark):
    """Fingerprint extraction is pure Columns — no BatchEvalPython /
    ArrowEval in the plan."""
    df = spark.createDataFrame([(1, "abc " * 30)], "doc_id long, text string")
    plan = document_fingerprints(df, k=K, w=W)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "InMemory" not in plan


def test_incremental_near_dedup_against_corpus(spark):
    """Tail-edited re-submissions are caught against the persisted
    index; genuinely new and unfingerprintable docs are admitted."""
    from qualityassurancetool_spark.operators.fingerprint import (
        near_dedup_against_corpus,
    )

    rng = random.Random(21)
    seen_rows = [(i, _rand_text(rng, 80)) for i in range(5)]
    seen = spark.createDataFrame(seen_rows, "doc_id long, text string")
    idx = document_fingerprints(seen, k=K, w=W)
    new = spark.createDataFrame(
        [
            (100, seen_rows[2][1] + " small tail edit"),  # near-dup of 2
            (101, _rand_text(rng, 80)),                   # genuinely new
            (102, "tiny"),                                # no fingerprints
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in near_dedup_against_corpus(
        new, idx, k=K, w=W, threshold=0.5
    ).collect()}
    assert out[100]["kept"] is False
    assert out[100]["dup_of_seen"] == 2
    assert out[100]["containment"] > 0.5
    assert out[101]["kept"] is True
    assert out[102]["kept"] is True and out[102]["n_fp"] == 0


def test_kernel_strategy_same_structure(spark):
    """The numpy winnowing kernel finds the same planted duplicate
    structure as the Column path (hash family differs by design)."""
    import pytest

    rng = random.Random(31)
    t = _rand_text(rng, 100)
    df = spark.createDataFrame(
        [(1, t), (2, t), (3, _rand_text(rng, 100))],
        "doc_id long, text string",
    )
    for strat in ("columns", "kernel"):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in fingerprint_overlap_pairs(
                df, k=K, w=W, strategy=strat
            ).collect()
        }
        assert got == {(1, 2)}, strat
    # identical docs: kernel containment is also 1.0
    pairs = fingerprint_overlap_pairs(
        df, k=K, w=W, strategy="kernel"
    ).collect()
    assert pairs[0]["containment"] == 1.0
    with pytest.raises(ValueError):
        document_fingerprints(df, strategy="nope").count()


def test_kernel_strategy_string_ids(spark):
    """The kernel path must carry the INPUT id type through (a
    string-keyed corpus used to raise inside numpy; the Column path
    always handled it)."""
    rng = random.Random(47)
    t = _rand_text(rng, 100)
    df = spark.createDataFrame(
        [("doc-a", t), ("doc-b", t), ("doc-c", _rand_text(rng, 100))],
        "doc_id string, text string",
    )
    fp = document_fingerprints(df, k=K, w=W, strategy="kernel")
    assert dict(fp.dtypes)["doc_id"] == "string"
    got = {
        (r["doc_a"], r["doc_b"])
        for r in fingerprint_overlap_pairs(
            df, k=K, w=W, strategy="kernel"
        ).collect()
    }
    assert got == {("doc-a", "doc-b")}

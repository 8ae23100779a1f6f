"""Quality-signal and deterministic-sampling operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.quality_filters import (
    quality_signals,
    quality_signals_long,
    SIGNAL_NAMES,
)
from qualityassurancetool_spark.operators.sampling import (
    deterministic_topk_per_stratum,
    stratified_sample,
    uniform_hash,
)

DOCS = "doc_id long, text string"


@pytest.fixture()
def qdocs(spark):
    rows = [
        (0, "a clean line\nanother line\na clean line"),      # 1 dup line of 3
        (1, "spam spam spam spam"),                            # heavy repetition
        (2, "contact me at john.doe@example.com or +32 495 12 34 56"),
        (3, "server at 192.168.0.1 responded"),
        (4, "normal text with no repeats here"),
        (5, ""),                                               # empty doc
    ]
    return spark.createDataFrame(rows, DOCS)


def test_quality_signals_values(spark, qdocs):
    out = {r["doc_id"]: r for r in quality_signals(qdocs).collect()}
    assert out[0]["dup_line_fraction"] == pytest.approx(1 / 3)
    # "spam spam spam spam": 4 tokens 1 distinct -> rep 0.75; bigrams all
    # "spam spam" -> top fraction 1.0
    assert out[1]["word_rep_ratio"] == pytest.approx(0.75)
    assert out[1]["top_bigram_fraction"] == pytest.approx(1.0)
    assert out[2]["pii_emails"] == 1.0
    assert out[2]["pii_phones"] >= 1.0
    assert out[3]["pii_ipv4"] == 1.0
    assert out[4]["word_rep_ratio"] == pytest.approx(0.0)
    # empty doc: every signal 0, nothing crashes
    for name in SIGNAL_NAMES:
        assert out[5][name] == pytest.approx(0.0)


def test_quality_signals_long_shape(spark, qdocs):
    out = quality_signals_long(qdocs).collect()
    assert len(out) == 6 * len(SIGNAL_NAMES)
    metrics = {r["metric"] for r in out}
    assert metrics == set(SIGNAL_NAMES)


def test_stratified_sample_deterministic_and_bounded(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    kept = stratified_sample(
        df, {"en": 0.5, "de": 0.1}, strata_col="stratum"
    )
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in kept.collect())  # re-run: identical
    assert a == b
    by_stratum = (
        kept.groupBy("stratum").count().collect()
    )
    counts = {r["stratum"]: r["count"] for r in by_stratum}
    # Bernoulli at n=2000/1000: within generous tolerance of expectation
    assert abs(counts["en"] / 2000 - 0.5) < 0.08
    assert abs(counts["de"] / 1000 - 0.1) < 0.06
    # unlisted strata drop entirely under default_fraction=0
    none_kept = stratified_sample(df, {}, strata_col="stratum")
    assert none_kept.count() == 0


def test_deterministic_topk_per_stratum(spark):
    rows = [(i, "en" if i % 2 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = deterministic_topk_per_stratum(df, k=7, strata_col="stratum")
    got = {}
    for r in out.collect():
        got.setdefault(r["stratum"], []).append(r["doc_id"])
    assert sorted(map(len, got.values())) == [7, 7]
    again = deterministic_topk_per_stratum(df, k=7, strata_col="stratum")
    got2 = {}
    for r in again.collect():
        got2.setdefault(r["stratum"], []).append(r["doc_id"])
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in got2.items()
    }


def test_deterministic_shuffle_is_a_permutation(spark):
    from qualityassurancetool_spark.operators.sampling import (
        deterministic_shuffle,
    )

    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(df, n_partitions=8)
    ids = [r["doc_id"] for r in out.collect()]
    assert sorted(ids) == list(range(5000))       # a permutation
    assert ids != list(range(5000))               # actually shuffled
    again = [r["doc_id"] for r in deterministic_shuffle(
        df, n_partitions=8
    ).collect()]
    assert ids == again                           # identical across runs
    other = [r["doc_id"] for r in deterministic_shuffle(
        df, salt="epoch2:", n_partitions=8
    ).collect()]
    assert ids != other                           # new salt, new order


def test_uniform_hash_is_uniform_ish(spark):
    df = spark.range(10_000).select(
        uniform_hash(F.col("id")).alias("u")
    )
    row = df.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("mu")
    ).collect()[0]
    assert 0.0 <= row["lo"] and row["hi"] < 1.0
    assert abs(row["mu"] - 0.5) < 0.02


def test_split_by_group_no_leakage_and_determinism(spark):
    from qualityassurancetool_spark.operators.sampling import split_by_group

    rows = [(i, f"domain{i % 17}") for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    out = split_by_group(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, "domain"
    )
    # every group maps to exactly one split (no leakage across splits)
    per_group = (
        out.groupBy("domain")
        .agg(F.countDistinct("split").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in per_group)
    # deterministic across invocations
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_by_group(
            df, {"train": 0.8, "val": 0.1, "test": 0.1}, "domain"
        ).collect()
    }
    assert a == b
    # all three splits appear across 17 domains and fractions are sane
    assert {r["split"] for r in out.collect()} <= {"train", "val", "test"}


def test_split_by_group_rejects_bad_fractions(spark):
    import pytest as _pytest

    from qualityassurancetool_spark.operators.sampling import split_by_group

    df = spark.createDataFrame([(1, "a")], ["doc_id", "g"])
    with _pytest.raises(ValueError):
        split_by_group(df, {}, "g")
    with _pytest.raises(ValueError):
        split_by_group(df, {"a": 0.9, "b": 0.3}, "g")

"""Round-3 curation rules: PII cap, classifier gate, external
near-dup drops — first-failing-reason semantics preserved."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.config import ConfigError
from qualityassurancetool_spark.operators.classifier import train_log_odds
from qualityassurancetool_spark.plans.curation import (
    CurationConfig,
    curate,
)

CLEAN = "good clean useful prose text with many plain words in it"
SPAMMY = "spam click buy now offer spam click buy now offer spam click"


def test_pii_rule(spark):
    docs = spark.createDataFrame(
        [
            (1, CLEAN),
            (2, CLEAN + " mail a@b.co and c@d.org and e@f.io now"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curate(
        docs, CurationConfig.from_dict({"max_pii_total": 2, "dedup": "none"})
    ).collect()}
    assert out[1]["keep"] is True
    assert out[2]["drop_reason"] == "pii"


def test_classifier_rule_and_model_requirement(spark):
    train = spark.createDataFrame(
        [(1, CLEAN, True), (2, SPAMMY, False)],
        "doc_id long, text string, label boolean",
    )
    model = train_log_odds(train, n_buckets=128)
    docs = spark.createDataFrame(
        [(10, CLEAN), (11, SPAMMY)], "doc_id long, text string"
    )
    cfg = CurationConfig.from_dict(
        {"min_classifier_prob": 0.5, "dedup": "none"}
    )
    out = {r["doc_id"]: r for r in curate(
        docs, cfg, classifier_model=model
    ).collect()}
    assert out[10]["keep"] is True
    assert out[11]["drop_reason"] == "classifier"
    with pytest.raises(ConfigError):
        curate(docs, cfg).collect()


def test_near_dup_drops_and_rule_order(spark):
    docs = spark.createDataFrame(
        [(1, CLEAN), (2, CLEAN + " extra"), (3, SPAMMY)],
        "doc_id long, text string",
    )
    drops = spark.createDataFrame(
        [(2,), (3,)], "doc_id long"
    )
    # doc 3 also fails the pii-free quality-free blocked-free chain? no:
    # give it a blocked domain so an EARLIER rule claims it first
    docs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 3,
            F.concat(F.col("text"), F.lit(" see https://bad.example.com/x")),
        ).otherwise(F.col("text")),
    )
    cfg = CurationConfig.from_dict(
        {"blocked_domains": ["bad.example.com"], "dedup": "none"}
    )
    out = {r["doc_id"]: r for r in curate(
        docs, cfg, near_dup_drops=drops
    ).collect()}
    assert out[1]["keep"] is True
    assert out[2]["drop_reason"] == "near_duplicate"
    # earlier rule wins the reason even though 3 is in the drop set
    assert out[3]["drop_reason"] == "blocked_domain"


def test_config_validation(spark):
    with pytest.raises(ConfigError):
        CurationConfig.from_dict({"max_pii_total": -1})
    with pytest.raises(ConfigError):
        CurationConfig.from_dict({"min_classifier_prob": 1.5})
    with pytest.raises(ConfigError):
        CurationConfig.from_dict({"min_classifier_probX": 0.5})


def test_drop_examples(spark):
    docs = spark.createDataFrame(
        [(i, CLEAN if i % 2 else SPAMMY) for i in range(40)],
        "doc_id long, text string",
    )
    from qualityassurancetool_spark.plans.curation import drop_examples

    cfg = CurationConfig.from_dict(
        {"max_word_rep_ratio": 0.5, "dedup": "none"}
    )
    decisions = curate(docs, cfg)
    ex = drop_examples(decisions, k=3)
    rows = [(r["rule"], r["doc_id"]) for r in ex.collect()]
    by_rule: dict[str, list[int]] = {}
    for rule, did in rows:
        by_rule.setdefault(rule, []).append(did)
    assert set(by_rule) == {"kept", "word_rep"}
    assert all(len(v) == 3 for v in by_rule.values())
    # deterministic across calls
    ex2 = [(r["rule"], r["doc_id"]) for r in drop_examples(
        curate(docs, cfg), k=3
    ).collect()]
    assert rows == ex2


def test_c4_page_rule(spark):
    from qualityassurancetool_spark.plans.curation import (
        CurationConfig,
        curate,
    )

    cfg = CurationConfig.from_dict({"c4_page_rules": True, "dedup": "none"})
    df = spark.createDataFrame(
        [
            (1, "A perfectly normal document sentence."),
            (2, "Lorem ipsum dolor sit amet paragraph filler."),
            (3, "code only { no prose here }"),
            (4, "no terminal punctuation at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["drop_reason"] for r in curate(df, cfg).collect()}
    assert out[1] is None
    assert out[2] == "c4_page"
    assert out[3] == "c4_page"
    assert out[4] == "c4_page"  # zero kept lines


def test_dsir_rule(spark, sf_dir):
    from qualityassurancetool_spark.operators.dsir import fit_log_ratio
    from qualityassurancetool_spark.plans.curation import (
        CurationConfig,
        curate,
    )
    from qualityassurancetool_spark.schema import load_table

    docs = load_table(spark, sf_dir, "documents")
    lr = fit_log_ratio(
        raw=docs, target=docs.where(F.col("lang") == "en"), n_buckets=256
    )
    cfg = CurationConfig.from_dict(
        {"min_dsir_score": 0.0, "dedup": "none"}
    )
    out = curate(docs, cfg, dsir_log_ratio=lr)
    dropped = out.where(F.col("drop_reason") == "dsir")
    kept = out.where(F.col("keep"))
    assert dropped.count() > 0 and kept.count() > 0
    # the gate actually tracks the target: kept docs skew en
    en_kept = kept.where(F.col("lang") == "en").count() / kept.count()
    en_all = docs.where(F.col("lang") == "en").count() / docs.count()
    assert en_kept > en_all

    # model required when the rule is on
    import pytest as _pt

    with _pt.raises(Exception):
        curate(docs, cfg).collect()


def test_new_rule_config_validation():
    from qualityassurancetool_spark.config import ConfigError
    from qualityassurancetool_spark.plans.curation import CurationConfig

    import pytest as _pt

    with _pt.raises(ConfigError):
        CurationConfig.from_dict({"c4_page_rules": "yes"})
    with _pt.raises(ConfigError):
        CurationConfig.from_dict({"min_dsir_score": "high"})
    cfg = CurationConfig.from_dict(
        {"c4_page_rules": True, "min_dsir_score": -0.5}
    )
    assert cfg.c4_page_rules and cfg.min_dsir_score == -0.5


def test_badwords_rule_word_and_phrase_boundaries(spark):
    """C4 bad-words semantics: whole words and whole phrases only —
    'ban ana' must not fire inside 'urban anagram', 'ass' must not
    fire inside 'associated'."""
    from qualityassurancetool_spark.plans.curation import (
        CurationConfig,
        curate,
    )

    docs = spark.createDataFrame(
        [
            (1, "a perfectly clean document body"),
            (2, "contains the word ASS plainly"),        # word hit (cased)
            (3, "its products are associated with it"),  # substring: no hit
            (4, "the ban ana split was eaten"),          # phrase hit
            (5, "an urban anagram puzzle"),              # phrase inside: no
            (6, None),
        ],
        ["doc_id", "text"],
    )
    cfg = CurationConfig.from_dict(
        {"badwords": ["ass", "Ban  Ana"], "dedup": "none"}
    )
    got = {
        r["doc_id"]: (r["keep"], r["drop_reason"])
        for r in curate(docs, cfg).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (False, "badwords")
    assert got[3] == (True, None)
    assert got[4] == (False, "badwords")
    assert got[5] == (True, None)
    assert got[6][0] is True  # null text: no badword hit

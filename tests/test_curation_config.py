"""Config-driven curation (plans/curation): validation, rule order,
drop reporting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.config import ConfigError
from qualityassurancetool_spark.plans.curation import (
    CurationConfig,
    curate,
    drop_report,
)


def test_config_validation_errors():
    with pytest.raises(ConfigError):
        CurationConfig.from_dict({"nope": 1})
    with pytest.raises(ConfigError):
        CurationConfig.from_dict({"min_quality": "high"})
    with pytest.raises(ConfigError):
        CurationConfig.from_dict({"max_symbol_ratio": 1.5})
    with pytest.raises(ConfigError):
        CurationConfig.from_dict({"dedup": "fuzzy"})
    with pytest.raises(ConfigError):
        CurationConfig.from_dict({"sample_fractions": {"en": 2.0}})
    with pytest.raises(ConfigError):
        CurationConfig.from_dict({"langs": []})
    cfg = CurationConfig.from_dict(
        {"min_quality": 0.2, "dedup": "none", "langs": ["en"]}
    )
    assert cfg.min_quality == 0.2 and cfg.dedup == "none"


DOCS = [
    # id, text — crafted per-rule
    (1, "the and is with that this for are was from have more will"),
    (2, "the and is with that this for are was from have more will"),  # dup of 1
    (3, "zzz qqq xxx"),                                   # low quality, short
    (4, "aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa"),  # word repetition
    (5, "see https://spam.bad.site/x for the offer and more details here"),
]


def _decisions(spark, cfg):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return {r["doc_id"]: r for r in curate(df, cfg).collect()}


def test_rules_fire_in_order_and_dedup_keeps_min_id(spark):
    cfg = CurationConfig.from_dict(
        {
            "min_quality": 0.4,  # doc 3 scores 0.36
            "max_word_rep_ratio": 0.5,
            "blocked_domains": ["bad.site"],
        }
    )
    got = _decisions(spark, cfg)
    assert got[1]["keep"] is True
    # doc 2 is a byte-identical duplicate of 1 → duplicate rule
    assert got[2]["drop_reason"] == "duplicate"
    assert got[3]["drop_reason"] == "quality"
    # doc 4: repetition rule (quality may pass; word_rep must name it
    # only if quality passed first — either way it must NOT be kept)
    assert got[4]["keep"] is False
    assert got[4]["drop_reason"] in ("quality", "word_rep")
    assert got[5]["drop_reason"] == "blocked_domain"


def test_dedup_keeper_survives_earlier_rules(spark):
    """If the min-id copy of a content group is killed by an EARLIER
    rule, the surviving copies must not all be tagged 'duplicate': the
    keeper is the smallest id among rows passing the preceding rules.

    Dedup groups by NORMALIZED text while dup_lines reads RAW text, so
    two docs can share a digest yet diverge on the rule: doc 1 repeats
    its lines (high dup-line fraction), doc 2 says the same words on one
    line."""
    words = "the quick brown fox jumps over the lazy dog tonight"
    df = spark.createDataFrame(
        [
            (1, "\n".join([words] * 4)),   # 4 identical lines → dup_lines
            (2, " ".join([words] * 4)),    # one line, same normalized form
            (3, " ".join([words] * 4)),    # true duplicate of doc 2
        ],
        ["doc_id", "text"],
    )
    cfg = CurationConfig.from_dict({"max_dup_line_fraction": 0.5})
    got = {r["doc_id"]: r for r in curate(df, cfg).collect()}
    assert got[1]["drop_reason"] == "dup_lines"
    # pre-fix, doc 1 (group min id) was the keeper, so 2 AND 3 were both
    # dropped as 'duplicate' and the content vanished from the corpus
    assert got[2]["keep"] is True
    assert got[3]["drop_reason"] == "duplicate"


def test_lang_gate_and_report(spark):
    cfg = CurationConfig.from_dict({"langs": ["en"], "dedup": "none"})
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = curate(df, cfg)
    rep = {r["rule"]: r["n"] for r in drop_report(out).collect()}
    assert sum(rep.values()) == len(DOCS)
    assert rep.get("kept", 0) >= 1
    # every non-kept doc names exactly one first-failing rule
    assert set(rep) <= {"kept", "lang"}


def test_sampling_rule_deterministic(spark):
    cfg = CurationConfig.from_dict(
        {"dedup": "none", "sample_fractions": {"en": 0.5}}
    )
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = {r["doc_id"]: r["keep"] for r in curate(df, cfg).collect()}
    b = {r["doc_id"]: r["keep"] for r in curate(df, cfg).collect()}
    assert a == b
    # unconfigured languages sample out entirely (fraction 0 default)
    und = [
        r["doc_id"]
        for r in curate(df, cfg)
        .where(F.col("predicted_lang") != "en")
        .collect()
    ]
    got = {r["doc_id"]: r for r in curate(df, cfg).collect()}
    for d in und:
        assert got[d]["drop_reason"] == "sampled_out"


def test_from_yaml_roundtrip(tmp_path):
    p = tmp_path / "cur.yaml"
    p.write_text(
        "min_quality: 0.4\nlangs: [en, nl]\nblocked_domains: [bad.site]\n"
        "dedup: exact\nsample_fractions:\n  en: 0.9\n"
    )
    cfg = CurationConfig.from_yaml(str(p))
    assert cfg.min_quality == 0.4
    assert cfg.langs == ["en", "nl"]
    assert cfg.sample_fractions == {"en": 0.9}
    empty = tmp_path / "empty.yaml"
    empty.write_text("")
    assert CurationConfig.from_yaml(str(empty)).dedup == "exact"


def test_blocked_domains_scalar_rejected():
    """A YAML scalar would iterate per character and the blocklist
    would silently match nothing (review finding, round 8)."""
    import pytest

    from qualityassurancetool_spark.config import ConfigError
    from qualityassurancetool_spark.plans.curation import CurationConfig

    with pytest.raises(ConfigError, match="blocked_domains"):
        CurationConfig.from_dict({"blocked_domains": "badsite.com"})


def test_curate_preserves_caller_signal_named_columns(spark):
    """A caller column that happens to share a gopher-signal name must
    come back untouched when no rule produced it (review finding,
    round 8 — the unconditional drop list stripped it)."""
    from qualityassurancetool_spark.plans.curation import (
        CurationConfig,
        curate,
    )

    docs = spark.createDataFrame(
        [(1, "clean prose words here", 42)],
        "doc_id long, text string, n_words long",
    )
    cfg = CurationConfig.from_dict({"max_word_rep_ratio": 0.9})
    out = curate(docs, cfg).collect()[0]
    assert out["n_words"] == 42


def test_curate_gopher_rules_dont_shadow_caller_columns(spark):
    """With gopher_rules ON, the caller's colliding n_words column must
    come back as ONE untouched column — internal signals are staged
    under _g_ names, never appended under the caller's name (review
    finding, round 9)."""
    from qualityassurancetool_spark.plans.curation import (
        CurationConfig,
        curate,
    )

    text = " ".join(["plain"] * 60) + " the of and to"
    docs = spark.createDataFrame(
        [(1, text, 42)], "doc_id long, text string, n_words long"
    )
    cfg = CurationConfig.from_dict({"gopher_rules": True})
    result = curate(docs, cfg)
    assert result.columns.count("n_words") == 1
    row = result.collect()[0]
    assert row["n_words"] == 42
    assert row["keep"]  # long clean prose passes the gopher rules


def test_rules_constant_covers_all_emitted_reasons(spark):
    """Every drop_reason curate can emit must appear in the documented
    RULES evaluation-order tuple (review finding: badwords/gopher were
    missing, so reason enumerators silently skipped them)."""
    from qualityassurancetool_spark.plans.curation import (
        RULES,
        CurationConfig,
        curate,
    )

    docs = spark.createDataFrame(
        [
            (1, "clean text that is fine and long enough to pass easily"),
            (2, "badword text that trips the badwords filter right here"),
            (3, "zz " * 80),
        ],
        "doc_id long, text string",
    )
    cfg = CurationConfig.from_dict(
        {
            "badwords": ["badword"],
            "gopher_rules": True,
            "max_word_rep_ratio": 0.5,
        }
    )
    reasons = {
        r["drop_reason"]
        for r in curate(docs, cfg).collect()
        if r["drop_reason"] is not None
    }
    assert reasons and reasons <= set(RULES)
    assert "badwords" in RULES and "gopher" in RULES

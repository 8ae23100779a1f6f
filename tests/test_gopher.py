"""Gopher §A.1.1 page-filter rules (operators/quality_filters.
gopher_signals / gopher_keep, curation `gopher_rules`).  Cross-engine
parity: tools/extra_oracles.py::x_gopher."""

from __future__ import annotations

import pytest

from qualityassurancetool_spark.operators.quality_filters import (
    GOPHER_DEFAULTS,
    gopher_keep,
    gopher_signals,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and that is fine "
    "to have with everything else here today " * 3
)


def _verdicts(spark, rows, th=None):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = gopher_keep(gopher_signals(df), th or {"min_words": 10})
    return {r["doc_id"]: r for r in out.collect()}


def test_each_rule_fires_first_in_published_order(spark):
    got = _verdicts(
        spark,
        [
            (1, GOOD),
            (2, "too short"),                               # n_words_low
            (3, "ab " * 40),                                # mean_word_len low
            (4, GOOD + " #" * 20),                          # symbol_ratio
            (5, "\n".join(f"- {GOOD[:40]} {i}" for i in range(12))),
            (6, "\n".join(f"{GOOD[:200]} {i}..." for i in range(12))),
            (7, ("1920 " * 9 + "word ") * 5),               # alpha_words
            (8, "zebra walrus quokka lemur panda " * 10),   # stopwords
            (9, None),                                      # null text
        ],
    )
    assert got[1]["gopher_fail"] is None and got[1]["keep"]
    assert got[2]["gopher_fail"] == "n_words_low"
    assert got[3]["gopher_fail"] == "mean_word_len"
    assert got[4]["gopher_fail"] == "symbol_ratio"
    assert got[5]["gopher_fail"] == "bullet_lines"
    assert got[6]["gopher_fail"] == "ellipsis_lines"
    assert got[7]["gopher_fail"] == "alpha_words"
    assert got[8]["gopher_fail"] == "stopwords"
    assert got[9]["gopher_fail"] == "n_words_low"  # empty -> 0 words


def test_signal_arithmetic_pinned(spark):
    """Hand-computed signals: 6-dot run counts as two ellipses; the
    unicode ellipsis counts too; bullets detected post-trim."""
    text = "the cat...... sat…\n   • bullet line\nplain line here"
    got = _verdicts(spark, [(1, text)])[1]
    # tokens: the cat...... sat… • bullet line plain line here  (9)
    assert got["n_words"] == 9
    assert got["symbol_word_ratio"] == pytest.approx((2 + 1) / 9)
    # lines: 'the cat...... sat…' (ellipsis end), '• bullet', 'plain'
    assert got["bullet_line_frac"] == pytest.approx(1 / 3)
    assert got["ellipsis_line_frac"] == pytest.approx(1 / 3)
    assert got["stopword_hits"] == 1  # only 'the'


def test_default_thresholds_and_overrides(spark):
    # 60 good words < default 50-word floor? GOOD*3 has ~60 words: kept
    got = _verdicts(spark, [(1, GOOD)], th={})
    assert got[1]["keep"], GOPHER_DEFAULTS
    strict = _verdicts(spark, [(1, GOOD)], th={"min_words": 1000})
    assert strict[1]["gopher_fail"] == "n_words_low"


def test_curation_gopher_rule_and_validation(spark):
    from qualityassurancetool_spark.config import ConfigError
    from qualityassurancetool_spark.plans.curation import (
        CurationConfig,
        curate,
    )

    docs = spark.createDataFrame(
        [(1, GOOD), (2, "way too short")], ["doc_id", "text"]
    )
    cfg = CurationConfig.from_dict({"gopher_rules": True, "dedup": "none"})
    got = {
        r["doc_id"]: (r["keep"], r["drop_reason"])
        for r in curate(docs, cfg).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (False, "gopher")
    with pytest.raises(ConfigError, match="gopher_rules must be a bool"):
        CurationConfig.from_dict({"gopher_rules": "yes"})

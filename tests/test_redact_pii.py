"""PII redaction (operators/quality_filters.redact_pii): placeholder
typing, replacement order, and audit counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.quality_filters import (
    redact_documents,
    redact_pii,
)


def _redact(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        r["redacted"]
        for r in df.select(redact_pii(F.col("text")).alias("redacted"))
        .orderBy("doc_id")
        .collect()
    ]


def test_each_type_gets_its_placeholder(spark):
    out = _redact(
        spark,
        [
            "mail me at Alice.Smith+x@Example.COM today",
            "server at 192.168.1.100 is down",
            "call +32 2 123 45 67 now",
            "clean text with no pii at all",
        ],
    )
    assert out[0] == "mail me at <EMAIL> today"
    assert out[1] == "server at <IP> is down"
    assert out[2] == "call <PHONE> now"
    assert out[3] == "clean text with no pii at all"


def test_email_wins_over_inner_ip_and_digits(spark):
    """An address whose local part looks like a dotted quad must be
    redacted as ONE email, not partially as an IP (REDACT_ORDER)."""
    (out,) = _redact(spark, ["ping user.10.0.0.1@example.com please"])
    assert out == "ping <EMAIL> please"
    assert "<IP>" not in out


def test_mixed_document_counts(spark):
    df = spark.createDataFrame(
        [(7, "a@b.co and c@d.org, box 10.0.0.5, tel +1 555 123 4567 x")],
        "doc_id long, text string",
    )
    row = redact_documents(df).collect()[0]
    assert row["n_redacted_emails"] == 2
    assert row["n_redacted_ipv4"] == 1
    assert row["n_redacted_phones"] == 1
    assert row["redacted"] == "<EMAIL> and <EMAIL>, box <IP>, tel <PHONE> x"


def test_plan_is_pure_columns(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    plan = (
        redact_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_domain_reputation_sheet(spark):
    from qualityassurancetool_spark.operators.quality_filters import (
        domain_reputation,
    )

    df = spark.createDataFrame(
        [
            (1, "clean words http://spam.io/x mail a@b.co"),
            (2, "more text https://spam.io/y $$$ ### !!!"),
            (3, "https://good.org/a plain and tidy prose"),
            (4, "no urls at all here"),
        ],
        "doc_id long, text string",
    )
    rep = {r["domain"]: r for r in domain_reputation(df).collect()}
    assert set(rep) == {"spam.io", "good.org"}
    assert rep["spam.io"]["n_docs"] == 2
    assert rep["spam.io"]["pii_doc_rate"] == 0.5
    assert rep["good.org"]["pii_doc_rate"] == 0.0
    assert rep["spam.io"]["avg_symbol_ratio"] > rep["good.org"]["avg_symbol_ratio"]


def test_compression_ratio_signal(spark):
    import random

    from qualityassurancetool_spark.operators.quality_filters import (
        compression_ratios,
    )

    rng = random.Random(5)
    noisy = "".join(
        rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 !?.,;")
        for _ in range(1000)
    )
    df = spark.createDataFrame(
        [
            (1, "spam " * 200),                      # highly repetitive
            (2, noisy),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in compression_ratios(df).collect()}
    assert out[1]["compression_ratio"] < 0.15      # repetition collapses
    assert out[2]["compression_ratio"] > 0.5       # high-entropy stays big
    assert out[3]["compression_ratio"] == 1.0
    assert out[3]["n_bytes"] == 0


def test_corpus_drift_detects_planted_shift(spark):
    from qualityassurancetool_spark.operators.quality_filters import (
        corpus_drift,
    )

    a = spark.createDataFrame(
        [(i, "plain clean words here repeated differently") for i in range(40)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(i, "plain clean words here $$$ ### !!! ???") for i in range(40)],
        "doc_id long, text string",
    )
    drift = {r["signal"]: r for r in corpus_drift(a, b).collect()}
    assert set(drift) == {
        "dup_line_fraction", "word_rep_ratio", "top_bigram_fraction",
        "symbol_ratio", "pii_emails", "pii_phones", "pii_ipv4",
    }
    assert drift["symbol_ratio"]["max_gap"] > 0.1
    assert drift["pii_emails"]["max_gap"] == 0.0
    # identical snapshots: zero drift everywhere
    zero = corpus_drift(a, a).agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).max("max_gap")
    ).collect()[0][0]
    assert zero == 0.0

"""Unicode normalization (operators/unicode_norm).  NFC is
cross-engine checked (tools/extra_oracles.py::x_unicode_nfc); NFKC and
the control strip are pinned here against planted examples."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.unicode_norm import (
    normalize_documents,
    strip_control_chars,
    unicode_normalize_udf,
)


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return normalize_documents(df, **kw).collect()[0]["text"]


def test_nfc_composes_accents(spark):
    assert _one(spark, "café") == "café"
    assert _one(spark, "Å") == "Å"
    # ANGSTROM SIGN canonicalizes to LATIN A WITH RING
    assert _one(spark, "Å") == "Å"


def test_nfkc_compatibility_folds(spark):
    # ligature fi, fullwidth digits, superscript — NFKC-only folds
    assert _one(spark, "ﬁle", form="NFKC") == "file"
    assert _one(spark, "１２３", form="NFKC") == "123"
    assert _one(spark, "x²", form="NFKC") == "x2"
    # NFC must NOT fold compatibility forms
    assert _one(spark, "ﬁle", form="NFC") == "ﬁle"


def test_control_stripping_keeps_structure(spark):
    out = _one(spark, "a\x07b\tc\nd\x00e")
    assert out == "ab\tc\nde"
    # and can be disabled
    out2 = _one(spark, "a\x07b", strip_controls=False)
    assert out2 == "a\x07b"


def test_pure_column_strip(spark):
    df = spark.createDataFrame([("x\x1fy",)], ["t"])
    got = df.select(strip_control_chars(F.col("t")).alias("t")).collect()
    assert got[0]["t"] == "xy"


def test_null_text_passes_through(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert normalize_documents(df).collect()[0]["text"] is None


def test_idempotent_and_dedup_relevant(spark):
    """The motivating property: composed and decomposed spellings of
    the same word md5-collide only AFTER normalization."""
    df = spark.createDataFrame(
        [(1, "café latte"), (2, "café latte")],
        ["doc_id", "text"],
    )
    raw = df.select(F.md5("text").alias("h")).distinct().count()
    normed = (
        normalize_documents(df)
        .select(F.md5("text").alias("h"))
        .distinct()
        .count()
    )
    assert raw == 2 and normed == 1


def test_bad_form_guard():
    with pytest.raises(ValueError):
        unicode_normalize_udf("NFX")

"""URL canonicalization + canonical-URL dedup (operators/urls)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.urls import (
    canonicalize_url,
    dedup_by_canonical_url,
)


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    return [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c"), "i")
        .orderBy("i")
        .collect()
    ]


def test_canonical_variants_collapse(spark):
    variants = [
        "HTTPS://WWW.Example.COM:443/Path/?utm_source=x#frag",
        "https://example.com/Path",
        "https://example.com/Path/",
        "  https://Example.com/Path?fbclid=1&utm_medium=m  ",
    ]
    out = _canon(spark, variants)
    assert set(out) == {"https://example.com/Path"}


def test_semantics_preserved(spark):
    out = _canon(
        spark,
        [
            "http://example.com",                 # empty path -> /
            "http://example.com:8080/x",          # non-default port kept
            "https://example.com/x?b=2&a=1",      # params kept, sorted
            "https://example.com/X",              # path case significant
            "ftp://example.com/f",                # non-http scheme passes through
            "no scheme here",                     # not a URL: lowercased trim only
        ],
    )
    assert out[0] == "http://example.com/"
    assert out[1] == "http://example.com:8080/x"
    assert out[2] == "https://example.com/x?a=1&b=2"
    assert out[3] == "https://example.com/X"
    assert out[4] == "ftp://example.com/f"
    assert out[5] == "no scheme here"


def test_dedup_by_canonical_url(spark):
    df = spark.createDataFrame(
        [
            (1, "https://example.com/a"),
            (2, "HTTPS://WWW.EXAMPLE.COM:443/a#x"),
            (3, "https://example.com/b"),
        ],
        "doc_id long, url string",
    )
    rows = {
        r["canonical_url"]: r for r in dedup_by_canonical_url(df).collect()
    }
    assert rows["https://example.com/a"]["keep_id"] == 1
    assert rows["https://example.com/a"]["n_dups"] == 2
    assert rows["https://example.com/b"]["n_dups"] == 1


def test_no_python_stage(spark):
    df = spark.createDataFrame([(1, "https://e.com/")], "doc_id long, url string")
    plan = (
        dedup_by_canonical_url(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan

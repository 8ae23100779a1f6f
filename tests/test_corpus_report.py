"""Corpus report capstone (plans/corpus_report + CLI `report`).
Cross-engine parity: tools/extra_oracles.py::x_corpus_report."""

from pyspark.sql import functions as F

from qualityassurancetool_spark.cli import main
from qualityassurancetool_spark.plans.corpus_report import (
    corpus_report,
    report_markdown,
)
from qualityassurancetool_spark.schema import load_table


def test_report_metrics_consistent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rep = {r["metric"]: r["value"] for r in corpus_report(docs).collect()}
    n = docs.count()
    assert rep["docs"] == float(n)
    assert rep["total_tokens"] > 0
    assert rep["avg_tokens_per_doc"] == rep["total_tokens"] / rep["docs"]
    assert 0.0 <= rep["exact_dup_rate"] < 1.0
    assert 0.0 <= rep["pii_doc_rate"] <= 1.0
    # percentiles are monotone
    assert (
        rep["n_tokens_p10"] <= rep["n_tokens_p50"] <= rep["n_tokens_p90"]
    )
    # language shares cover the corpus exactly
    shares = [v for k, v in rep.items() if k.startswith("lang_share:")]
    assert shares and abs(sum(shares) - 1.0) < 1e-9
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert {f"lang_share:{lg}" for lg in langs} == {
        k for k in rep if k.startswith("lang_share:")
    }


def test_report_detects_planted_duplicates(spark):
    rows = [(i, "identical corpus text body", "en") for i in range(8)] + [
        (100, "a unique document text", "en")
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    rep = {r["metric"]: r["value"] for r in corpus_report(df).collect()}
    # 9 docs, 2 distinct → dup rate 7/9
    assert abs(rep["exact_dup_rate"] - 7.0 / 9.0) < 1e-9
    assert rep["lang_share:en"] == 1.0


def test_report_without_lang_column(spark):
    df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    rep = corpus_report(df)
    metrics = [r["metric"] for r in rep.collect()]
    assert "docs" in metrics
    assert not any(m.startswith("lang_share:") for m in metrics)


def test_report_markdown_renders(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    md = report_markdown(corpus_report(docs))
    assert md.startswith("| metric | value |")
    assert "exact_dup_rate" in md


def test_report_cli(spark, tmp_path, capsys):
    out = str(tmp_path / "rep")
    rc = main([
        "report", "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=documents",
        f"data.out={out}",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "| docs |" in printed
    back = spark.read.parquet(out)
    assert back.where(F.col("metric") == "docs").count() == 1


def test_report_markdown_null_values(spark):
    """Null metric values (percentiles over an empty corpus) render as
    n/a instead of raising TypeError (ADVICE r3)."""
    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType,
    )

    rep = spark.createDataFrame(
        [("docs", 0.0), ("len_p50", None)],
        StructType([
            StructField("metric", StringType()),
            StructField("value", DoubleType()),
        ]),
    )
    md = report_markdown(rep)
    assert "n/a" in md and "len_p50" in md


def test_null_text_docs_are_not_counted_as_duplicates(spark):
    import pytest

    """countDistinct skips NULL digests: without the sentinel, 3
    null-text docs among 7 distinct ones read as exact_dup_rate 0.3
    (review finding, round 8; same convention as plans/incremental)."""
    from qualityassurancetool_spark.plans.corpus_report import (
        corpus_report,
    )

    rows = [(i, f"distinct doc number {i} content") for i in range(7)]
    rows += [(10, None), (11, None), (12, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    metrics = {
        r["metric"]: r["value"] for r in corpus_report(docs).collect()
    }
    # 7 distinct texts + the shared null sentinel = 8 distinct digests
    assert metrics["exact_dup_rate"] == pytest.approx(1.0 - 8 / 10)


def test_value_histogram_excludes_nan(spark):
    from qualityassurancetool_spark.plans.corpus_report import (
        value_histogram,
    )

    df = spark.createDataFrame(
        [(0.1,), (0.9,), (float("nan"),)], "score double"
    )
    out = value_histogram(df, "score", lo=0.0, hi=1.0, n_bins=2).collect()
    assert sum(r["n"] for r in out) == 2  # NaN row neither binned nor clamped

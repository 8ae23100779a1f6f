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

"""Line-level cleaning (operators/line_dedup): C4 line/page rules and
cross-document keep-first line dedup.  Cross-engine parity is covered
by tools/extra_oracles.py::{x_c4_lines, x_corpus_line_dedup}."""

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.line_dedup import (
    c4_clean,
    corpus_line_dedup,
    line_occurrences,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_c4_line_rules(spark):
    doc = "\n".join(
        [
            "This sentence survives the filter.",  # kept
            "no terminal punctuation here",  # dropped: no punct
            "Too short.",  # dropped: < 3 words
            "Please enable JavaScript to continue reading.",  # dropped: js
            "Does a question mark count as terminal?",  # kept
            'He said "stop here."',  # kept (quote after punct)
        ]
    )
    row = c4_clean(_df(spark, [(1, doc)])).collect()[0]
    assert row["n_lines"] == 6
    assert row["n_kept"] == 3
    assert row["clean_text"].splitlines() == [
        "This sentence survives the filter.",
        "Does a question mark count as terminal?",
        'He said "stop here."',
    ]
    assert not row["page_drop"]


def test_c4_page_drops(spark):
    rows = [
        (1, "Lorem ipsum dolor sit amet consectetur."),  # blocklist
        (2, "function f() { return 1; }"),  # raw code brace
        (3, "no keepable line here"),  # 0 kept lines
        (4, "A perfectly fine document sentence."),
    ]
    out = {r["doc_id"]: r["page_drop"] for r in c4_clean(_df(spark, rows)).collect()}
    assert out == {1: True, 2: True, 3: True, 4: False}


def test_short_lines_not_dedup_eligible(spark):
    df = _df(spark, [(1, "ok\nshort"), (2, "ok\nshort")])
    assert line_occurrences(df).count() == 0


def test_corpus_line_dedup_keep_first(spark):
    boiler = "All rights reserved to the example corporation."
    df = _df(
        spark,
        [
            (1, f"Unique first doc line alpha.\n{boiler}"),
            (2, f"{boiler}\nUnique second doc line beta."),
            (3, f"Unique third doc line gamma.\n{boiler}\n{boiler}"),
        ],
    )
    out = {r["doc_id"]: r for r in corpus_line_dedup(df).collect()}
    # doc 1 holds the first (doc_id, idx) occurrence → keeps it
    assert boiler in out[1]["text"]
    assert out[1]["n_dup_lines_removed"] == 0
    # docs 2 and 3 lose every later occurrence
    assert boiler not in out[2]["text"]
    assert out[2]["text"] == "Unique second doc line beta."
    assert out[2]["n_dup_lines_removed"] == 1
    assert out[3]["n_dup_lines_removed"] == 2
    assert out[3]["text"] == "Unique third doc line gamma."


def test_corpus_line_dedup_whitespace_normalized_match(spark):
    """Lines matching after trim dedup together; original spacing of the
    kept doc is preserved."""
    df = _df(
        spark,
        [
            (1, "   A trimmed duplicate line here.   "),
            (2, "A trimmed duplicate line here."),
        ],
    )
    out = {r["doc_id"]: r for r in corpus_line_dedup(df).collect()}
    assert out[1]["n_dup_lines_removed"] == 0
    assert out[1]["text"] == "   A trimmed duplicate line here.   "
    assert out[2]["text"] == ""


def test_untouched_docs_pass_through_unchanged(spark):
    df = _df(spark, [(1, "Totally unique content sentence one."),
                     (2, "Different unique content sentence two.")])
    out = corpus_line_dedup(df)
    assert out.where(F.col("n_dup_lines_removed") > 0).count() == 0
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert texts[1] == "Totally unique content sentence one."

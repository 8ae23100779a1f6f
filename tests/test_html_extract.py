"""HTML → text extraction (operators/html_extract).
No SQL oracle (DuckDB cannot parse HTML) — golden-fixture gate."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.html_extract import (
    extract_blocks,
    extract_documents,
)

PAGE = """<!DOCTYPE html>
<html><head><title>T</title><style>p { color: red }</style>
<script>var x = "SCRIPT NOISE";</script></head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/x">X</a></nav>
<article>
<h1>A Real Headline For The Piece</h1>
<p>This is the first real paragraph of body text, long enough to keep
and it even has <a href="ref">one inline link</a> inside the prose.</p>
<p>Second paragraph with an &amp; entity and some more words to pass
the minimum length bar comfortably.</p>
</article>
<footer><a href="/tos">Terms</a> | <a href="/priv">Privacy</a></footer>
</body></html>"""


def test_blocks_keep_prose_drop_nav_and_script():
    text, kept, dropped = extract_blocks(PAGE)
    assert "first real paragraph" in text
    assert "Second paragraph with an & entity" in text
    assert "A Real Headline For The Piece" in text
    assert "SCRIPT NOISE" not in text
    assert "color: red" not in text
    assert "Home" not in text          # nav: short + link-dense
    assert "Privacy" not in text       # footer links
    assert kept == 3 and dropped >= 2


def test_long_linky_prose_survives_short_nav_does_not():
    linky = (
        "<p>"
        + " ".join(f'<a href="{i}">reference {i}</a>' for i in range(30))
        + "</p>"
    )
    # long but ~100% link density → still boilerplate
    text, kept, dropped = extract_blocks(linky)
    assert kept == 0 and dropped == 1
    body = (
        "<p>A genuinely long paragraph of body text that happens to "
        'cite <a href="a">one</a> source and keeps flowing with many '
        "more ordinary words after the citation.</p>"
    )
    text, kept, _ = extract_blocks(body)
    assert kept == 1 and "keeps flowing" in text


def test_malformed_and_empty():
    assert extract_blocks("") == ("", 0, 0)
    assert extract_blocks(None) == ("", 0, 0)
    # unclosed tags: parser tolerance, text still extracted
    text, kept, _ = extract_blocks(
        "<div><p>Unclosed but perfectly readable paragraph content here"
    )
    assert kept == 1 and "perfectly readable" in text


def test_dataframe_kernel(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, "<p>Too short</p>"), (3, None)],
        ["doc_id", "html"],
    )
    out = {r["doc_id"]: r for r in extract_documents(df).collect()}
    assert sorted(extract_documents(df).columns) == sorted(
        ["doc_id", "text", "n_blocks", "n_boilerplate_blocks"]
    )
    assert out[1]["n_blocks"] == 3
    assert "first real paragraph" in out[1]["text"]
    assert out[2]["text"] == "" and out[2]["n_boilerplate_blocks"] == 1
    assert out[3]["text"] == "" and out[3]["n_blocks"] == 0


GOOD_PARA = (
    "This is a long paragraph of body prose with plenty of the usual "
    "English function words so that the stopword density is high and "
    "the classifier can see that it was written for a reader and not "
    "for a navigation menu, which is what we want it to decide here."
)

ARTICLE = f"""
<html><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<h1>A Short Headline</h1>
<p>{GOOD_PARA}</p>
<p>Brief quote.</p>
<p>{GOOD_PARA}</p>
<div><a href="/a">one</a> <a href="/b">two</a> <a href="/c">three</a></div>
</body></html>
"""


def test_justext_recovers_headings_and_short_quotes():
    """The full jusText revision keeps the heading above good prose and
    the short quote BETWEEN good paragraphs — exactly what the core
    AND-filter drops — while still dropping both nav clusters."""
    from qualityassurancetool_spark.operators.html_extract import (
        extract_blocks_justext,
    )

    core_text, _, _ = extract_blocks(ARTICLE)
    jx_text, kept, dropped = extract_blocks_justext(ARTICLE)
    assert "A Short Headline" not in core_text  # core trades recall…
    assert "Brief quote." not in core_text
    assert "A Short Headline" in jx_text        # …justext recovers it
    assert "Brief quote." in jx_text
    for text in (core_text, jx_text):
        assert "Home" not in text and "Contact" not in text
        assert GOOD_PARA in text
    assert kept == 4 and dropped == 2


def test_justext_short_block_amid_bad_stays_dropped():
    """The same short string inside a navigation cluster is NOT kept:
    classification is contextual, not textual."""
    from qualityassurancetool_spark.operators.html_extract import (
        extract_blocks_justext,
    )

    nav_page = """
    <div><a href="/a">one</a> <a href="/b">two</a></div>
    <p>Brief quote.</p>
    <div><a href="/c">three</a> <a href="/d">four</a></div>
    """
    text, kept, dropped = extract_blocks_justext(nav_page)
    assert "Brief quote." not in text
    assert kept == 0 and dropped == 3


def test_extract_documents_engine_dispatch(spark):
    from qualityassurancetool_spark.operators.html_extract import (
        extract_documents,
    )

    df = spark.createDataFrame([(1, ARTICLE)], ["doc_id", "html"])
    jx = extract_documents(df, engine="justext").collect()[0]
    assert "A Short Headline" in jx["text"]
    assert jx["n_blocks"] == 4 and jx["n_boilerplate_blocks"] == 2
    with pytest.raises(ValueError):
        extract_documents(df, engine="nope")


def test_trafilatura_engine_gated():
    from qualityassurancetool_spark.operators.html_extract import (
        extract_blocks_trafilatura,
    )

    try:
        import trafilatura  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="justext"):
            extract_blocks_trafilatura(ARTICLE)
    else:  # pragma: no cover - env-dependent
        text, kept, dropped = extract_blocks_trafilatura(ARTICLE)
        assert "paragraph of body prose" in text and dropped == -1


def test_extract_cli_engine_knob(spark, tmp_path, capsys):
    from qualityassurancetool_spark.cli import main

    src = str(tmp_path / "pages")
    spark.createDataFrame(
        [(1, ARTICLE)], ["doc_id", "html"]
    ).write.parquet(src)
    out = str(tmp_path / "docs")
    rc = main([
        "extract", "--keep-session", f"data.input={src}",
        f"data.out={out}", "format=html", "engine=justext",
    ])
    assert rc == 0
    capsys.readouterr()
    row = spark.read.parquet(out).collect()[0]
    assert "A Short Headline" in row["text"]

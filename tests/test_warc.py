"""WARC source (sources/warc).  Golden archives built byte-by-byte —
no SQL oracle (DuckDB reads no WARC)."""

import gzip

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.sources.warc import (
    iter_warc_records,
    read_warc,
)


def _record(wtype, uri, payload: bytes, date="2026-01-02T03:04:05Z"):
    head = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + f"WARC-Date: {date}\r\nContent-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, status=200, ctype="text/html"):
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _archive():
    return (
        _record("warcinfo", None, b"software: test\r\n")
        + _record(
            "request", "http://a.example/", b"GET / HTTP/1.1\r\n\r\n"
        )
        + _record(
            "response",
            "http://a.example/",
            _http(b"<html><p>Hello archive world</p></html>"),
        )
        + _record(
            "response",
            "http://b.example/x",
            _http(b"not found", status=404, ctype="text/plain"),
        )
        + _record("response", "http://c.example/", b"\x00binary-not-http")
    )


def test_iter_records_framing():
    recs = list(iter_warc_records(_archive()))
    assert [h.get("warc-type") for h, _ in recs] == [
        "warcinfo", "request", "response", "response", "response",
    ]
    # truncated archive stops cleanly at the broken record
    cut = _archive()[:-40]
    assert len(list(iter_warc_records(cut))) >= 3


def test_read_warc_plain_and_gzip(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_archive())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_archive()))
    out = read_warc(spark, str(tmp_path / "*.warc*"))
    rows = out.collect()
    # 2 HTTP responses per archive x 2 files (the binary payload is
    # skipped), warcinfo/request never become rows
    assert len(rows) == 4
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    a = by_url["http://a.example/"][0]
    assert a["http_status"] == 200
    assert a["content_type"] == "text/html"
    assert "Hello archive world" in a["html"]
    assert a["warc_date"] == "2026-01-02T03:04:05Z"
    b = by_url["http://b.example/x"][0]
    assert b["http_status"] == 404 and b["html"] == "not found"


def test_warc_to_text_pipeline(spark, tmp_path):
    """The crawl front end end-to-end: WARC → extract_documents."""
    from qualityassurancetool_spark.operators.html_extract import (
        extract_documents,
    )

    page = (
        b"<html><body><nav><a href='/'>Home</a></nav>"
        b"<p>A real paragraph of crawled body text that is long "
        b"enough to clear the boilerplate bar easily.</p></body></html>"
    )
    arc = _record("response", "http://site.example/", _http(page))
    (tmp_path / "c.warc").write_bytes(arc)
    docs = read_warc(spark, str(tmp_path / "c.warc")).where(
        (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
    )
    out = extract_documents(docs).collect()
    assert len(out) == 1
    assert "real paragraph of crawled body text" in out[0]["text"]
    assert out[0]["n_boilerplate_blocks"] >= 1


def test_extract_cli_on_warc(spark, tmp_path, capsys):
    from qualityassurancetool_spark.cli import main

    page = (
        b"<html><body><p>Command line extraction of a long enough "
        b"paragraph from a WARC archive works end to end.</p>"
        b"</body></html>"
    )
    arc = _record("response", "http://cli.example/", _http(page))
    (tmp_path / "d.warc").write_bytes(arc)
    out = str(tmp_path / "docs")
    rc = main([
        "extract", "--keep-session",
        f"data.input={tmp_path}/d.warc", f"data.out={out}",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert report == {"docs": "1", "nonempty": "1"}
    row = spark.read.parquet(out).collect()[0]
    assert row["url"] == "http://cli.example/"
    assert "Command line extraction" in row["text"]
    assert isinstance(row["doc_id"], int)

    assert main([
        "extract", "--keep-session", "data.input=/x", "data.out=/y",
        "format=nope",
    ]) == 2

"""WARC (Web ARChive) source — the container format of web crawls.

Common-Crawl-style corpora land as ``*.warc.gz``: a sequence of
records, each a header block (``WARC/1.0``, ``WARC-Type``,
``WARC-Target-URI``, ``Content-Length``, …) then exactly
``Content-Length`` payload bytes, then a blank-line separator (ISO
28500, public spec).  For ``response`` records the payload is an HTTP
response — status line + headers + body.

Hermetic stdlib reader (the warcio swap point is ``iter_warc_records``,
same seam convention as the codec/HTML kernels):

 - one input FILE per task via Spark's ``binaryFile`` source — WARC
   members are concatenated gzip streams, so the archive as a whole is
   not block-splittable without an index; per-file parallelism is the
   standard shape (Common Crawl ships ~1 GB files precisely so that
   file == work unit; same memory-bound-per-task contract as the
   WebDataset tar reader);
 - record framing is length-delimited — no regex over payloads, bodies
   pass through as bytes and decode lazily;
 - only ``response`` records yield rows (the ``warcinfo``/``request``
   records are framing); HTTP headers are dropped after extracting the
   status and content type; non-HTTP payloads are skipped.

Output: (warc_file, url, warc_date, http_status, content_type, html) —
feed ``operators/html_extract.extract_documents`` next.

No SQL oracle (DuckDB reads no WARC); golden-fixture pytest builds
archives byte-by-byte (`tests/test_warc.py`).
"""

from __future__ import annotations

import gzip
import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("http_status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("html", StringType()),
    ]
)


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
    return headers


def iter_warc_records(raw: bytes):
    """Yield (warc_headers, payload_bytes) from (possibly gzipped)
    WARC bytes.  Tolerant of trailing garbage: stops at the first
    unparseable record boundary rather than raising."""
    if raw[:2] == b"\x1f\x8b":
        # members are concatenated gzip streams; GzipFile reads them all
        raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
    buf = io.BytesIO(raw)
    while True:
        # skip blank separator lines
        line = buf.readline()
        while line in (b"\r\n", b"\n"):
            line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            return  # lost framing: stop, do not guess
        header_lines = []
        while True:
            line = buf.readline()
            if line in (b"\r\n", b"\n", b""):
                break
            header_lines.append(line.rstrip(b"\r\n"))
        headers = _parse_headers(b"\r\n".join(header_lines))
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        payload = buf.read(length)
        if len(payload) < length:
            return  # truncated archive
        yield headers, payload


def _http_split(payload: bytes):
    """(status, content_type, body) from an HTTP response payload, or
    None when the payload is not HTTP."""
    if not payload.startswith(b"HTTP/"):
        return None
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None
    http_headers = _parse_headers(b"\r\n".join(lines[1:]))
    ctype = http_headers.get("content-type", "")
    return status, ctype, body


def read_warc(
    spark: SparkSession,
    path: str,
    encoding: str = "utf-8",
) -> DataFrame:
    """DataFrame of response records from ``path`` (glob over
    ``*.warc`` / ``*.warc.gz``).  One file per task — see module
    docstring for why WARC parallelism is per-file."""
    binary = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def kernel(batches):
        import pandas as pd

        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            # yield PER FILE: the memory contract is one archive's
            # documents at a time, even when binaryFile batches
            # several ~1 GB files into one Arrow batch
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                rows = []
                for headers, payload in iter_warc_records(bytes(raw)):
                    if headers.get("warc-type") != "response":
                        continue
                    http = _http_split(payload)
                    if http is None:
                        continue
                    status, ctype, body = http
                    rows.append(
                        (
                            fpath,
                            headers.get("warc-target-uri"),
                            headers.get("warc-date"),
                            status,
                            ctype,
                            body.decode(encoding, errors="replace"),
                        )
                    )
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return binary.mapInPandas(kernel, WARC_SCHEMA)

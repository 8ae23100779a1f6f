"""JSONL corpus source/sink (sources/jsonl): schema enforcement,
corrupt-line quarantine, round trip, partitioned/gzip write."""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from qualityassurancetool_spark.sources.jsonl import (
    jsonl_ingest_report,
    read_jsonl,
    write_jsonl,
)


def test_read_quarantines_corrupt_lines(spark):
    root = tempfile.mkdtemp(prefix="jsonl")
    try:
        p = os.path.join(root, "a.jsonl")
        with open(p, "w") as f:
            f.write(json.dumps({"doc_id": 1, "text": "ok", "lang": "en",
                                "source": "t", "n_chars": 2}) + "\n")
            f.write("{ this is not json\n")
            f.write(json.dumps({"doc_id": 2, "text": "also ok",
                                "lang": "de", "source": "t",
                                "n_chars": 7}) + "\n")
        df = read_jsonl(spark, p)
        clean, n_bad = jsonl_ingest_report(df)
        assert n_bad == 1
        rows = {r["doc_id"]: r for r in clean.collect()}
        assert rows[1]["text"] == "ok" and rows[2]["lang"] == "de"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_round_trip_partitioned_gzip(spark):
    root = tempfile.mkdtemp(prefix="jsonl")
    try:
        src = spark.createDataFrame(
            [(1, "alpha", "en", "s", 5), (2, "beta", "de", "s", 4),
             (3, "gamma", "en", "s", 5)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = os.path.join(root, "out")
        write_jsonl(src, out, partition_by=["lang"], compress=True)
        # partition dirs + gzip part files on disk
        assert sorted(
            d for d in os.listdir(out) if d.startswith("lang=")
        ) == ["lang=de", "lang=en"]
        gz = glob.glob(os.path.join(out, "lang=en", "*.json.gz"))
        assert gz
        with gzip.open(gz[0], "rt") as f:
            line = json.loads(f.readline())
        assert set(line) <= {"doc_id", "text", "source", "n_chars"}
        # round trip preserves the multiset
        back = spark.read.json(out)
        got = sorted(
            (r["doc_id"], r["text"], r["lang"]) for r in back.collect()
        )
        assert got == [(1, "alpha", "en"), (2, "beta", "de"),
                       (3, "gamma", "en")]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_schema_enforced_not_inferred(spark):
    """A JSONL file with a drifting extra field reads under the CONTRACT
    schema: extra fields are ignored, missing ones are null — no silent
    schema union."""
    root = tempfile.mkdtemp(prefix="jsonl")
    try:
        p = os.path.join(root, "b.jsonl")
        with open(p, "w") as f:
            f.write(json.dumps({"doc_id": 7, "text": "x", "lang": "en",
                                "source": "t", "n_chars": 1,
                                "surprise": True}) + "\n")
            f.write(json.dumps({"doc_id": 8, "text": "y"}) + "\n")
        clean, n_bad = jsonl_ingest_report(read_jsonl(spark, p))
        assert n_bad == 0
        assert "surprise" not in clean.columns
        rows = {r["doc_id"]: r for r in clean.collect()}
        assert rows[8]["lang"] is None
    finally:
        shutil.rmtree(root, ignore_errors=True)

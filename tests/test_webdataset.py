"""WebDataset tar shards (sources/webdataset): round trip, manifest,
deterministic membership, byte-stable re-runs."""

from __future__ import annotations

import glob
import json
import os
import shutil
import tarfile
import tempfile

from pyspark.sql import functions as F

from qualityassurancetool_spark.sources.webdataset import (
    read_webdataset_shards,
    write_webdataset_shards,
)

ROWS = [
    (i, f"text of document {i}", "en" if i % 2 else "de", bytes([i]) * 4)
    for i in range(20)
]
SCHEMA = "doc_id long, text string, lang string, payload binary"


def test_round_trip_and_manifest(spark):
    root = tempfile.mkdtemp(prefix="wds")
    try:
        df = spark.createDataFrame(ROWS, SCHEMA)
        man = write_webdataset_shards(
            df, root, n_shards=4, meta_cols=("lang",), binary_col="payload"
        )
        rows = man.collect()
        assert sum(r["n_samples"] for r in rows) == 20
        assert len(glob.glob(os.path.join(root, "shard-*.tar"))) == len(rows)

        back = read_webdataset_shards(spark, root)
        by_kind = {
            r["ext"]: n
            for r, n in [
                (x, x["n"]) for x in back.groupBy("ext").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            ]
        }
        assert by_kind == {"txt": 20, "json": 20, "bin": 20}
        texts = {
            int(r["key"]): r["data"].decode()
            for r in back.where("ext = 'txt'").collect()
        }
        assert texts[7] == "text of document 7"
        metas = {
            int(r["key"]): json.loads(r["data"])
            for r in back.where("ext = 'json'").collect()
        }
        assert metas[3] == {"lang": "en"}
        bins = {
            int(r["key"]): bytes(r["data"])
            for r in back.where("ext = 'bin'").collect()
        }
        assert bins[5] == bytes([5]) * 4
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_rerun_is_byte_identical(spark):
    root = tempfile.mkdtemp(prefix="wds")
    try:
        df = spark.createDataFrame(ROWS, SCHEMA)
        write_webdataset_shards(df, root, n_shards=2)
        first = {
            p: open(p, "rb").read()
            for p in glob.glob(os.path.join(root, "*.tar"))
        }
        write_webdataset_shards(df, root, n_shards=2)
        for p, blob in first.items():
            assert open(p, "rb").read() == blob, p
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_samples_sorted_within_shard(spark):
    root = tempfile.mkdtemp(prefix="wds")
    try:
        df = spark.createDataFrame(ROWS, SCHEMA)
        write_webdataset_shards(df, root, n_shards=1)
        with tarfile.open(os.path.join(root, "shard-00000.tar")) as tf:
            names = [m.name for m in tf.getmembers()]
        assert names == sorted(names)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_shard_col_path_matches_default_path(spark):
    """Pre-assigned shard column (the pretrain pipeline's path) must
    produce byte-identical tars to the writer-assigned default path —
    the membership-parity invariant plans/pretrain relies on."""
    import pytest

    from qualityassurancetool_spark.sources.webdataset import (
        WDS_SALT,
        shard_of,
    )

    df = spark.createDataFrame(ROWS, SCHEMA)
    a, b = tempfile.mkdtemp(prefix="wdsA"), tempfile.mkdtemp(prefix="wdsB")
    try:
        write_webdataset_shards(df, a, n_shards=4, meta_cols=("lang",))
        pre = df.withColumn(
            "my_shard", shard_of(F.col("doc_id"), 4, WDS_SALT)
        )
        write_webdataset_shards(
            pre, b, n_shards=4, meta_cols=("lang",), shard_col="my_shard"
        )
        tars_a = sorted(os.listdir(a))
        assert tars_a == sorted(os.listdir(b))
        for name in tars_a:
            wa = open(os.path.join(a, name), "rb").read()
            wb = open(os.path.join(b, name), "rb").read()
            assert wa == wb, name

        # fail fast on invalid pre-assigned shards
        with pytest.raises(Exception, match="NULL|outside"):
            write_webdataset_shards(
                df.withColumn("my_shard", F.lit(None).cast("int")),
                tempfile.mkdtemp(prefix="wdsN"),
                n_shards=4,
                shard_col="my_shard",
            )
        with pytest.raises(Exception, match="outside"):
            write_webdataset_shards(
                df.withColumn("my_shard", F.lit(99)),
                tempfile.mkdtemp(prefix="wdsR"),
                n_shards=4,
                shard_col="my_shard",
            )
    finally:
        shutil.rmtree(a, ignore_errors=True)
        shutil.rmtree(b, ignore_errors=True)

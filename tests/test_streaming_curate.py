"""Streaming curation (streaming/micro_batch.streaming_curate):
file source → per-batch decision sheet → parquet sink, idempotent
under checkpointed re-run."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from qualityassurancetool_spark.plans.curation import CurationConfig
from qualityassurancetool_spark.streaming.micro_batch import (
    streaming_curate,
)

SCHEMA = "doc_id long, text string"
GOOD = "plenty of clean readable prose words in this document body"
SPAM = "zz zz zz zz zz zz zz zz zz zz zz zz"


def _land(dirpath, spark, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(dirpath, name))


def test_streaming_curate_end_to_end(spark):
    root = tempfile.mkdtemp(prefix="scur")
    land = os.path.join(root, "land")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    try:
        os.makedirs(land)
        _land(land, spark, [(1, GOOD), (2, SPAM), (3, GOOD)], "a")
        cfg = CurationConfig.from_dict(
            {"max_word_rep_ratio": 0.5, "dedup": "exact"}
        )
        stream = spark.readStream.schema(SCHEMA).parquet(land + "/*")
        q = streaming_curate(stream, cfg, out, ckpt)
        q.awaitTermination(120)
        got = {
            r["doc_id"]: r
            for r in spark.read.parquet(out).collect()
        }
        assert got[1]["keep"] is True
        assert got[2]["drop_reason"] == "word_rep"
        # within-batch exact dedup: doc 3 duplicates doc 1
        assert got[3]["drop_reason"] == "duplicate"

        # second availableNow run with NO new files appends nothing
        q2 = streaming_curate(
            spark.readStream.schema(SCHEMA).parquet(land + "/*"),
            cfg, out, ckpt,
        )
        q2.awaitTermination(120)
        assert spark.read.parquet(out).count() == 3

        # a new landing file is processed incrementally
        _land(land, spark, [(4, GOOD + " fresh")], "b")
        q3 = streaming_curate(
            spark.readStream.schema(SCHEMA).parquet(land + "/*"),
            cfg, out, ckpt,
        )
        q3.awaitTermination(120)
        rows = spark.read.parquet(out)
        assert rows.count() == 4
        assert rows.filter(F.col("doc_id") == 4).collect()[0]["keep"] is True
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_streaming_near_dedup_admission(spark):
    """Cross-batch near-dup: a tail-edited resubmission in a LATER batch
    is rejected against the persisted fingerprint index; genuinely new
    docs admit and extend the index."""
    import random

    from qualityassurancetool_spark.streaming.micro_batch import (
        streaming_near_dedup_admission,
    )

    rng = random.Random(3)

    def doc(n):
        return " ".join(
            "".join(rng.choice("abcdefghij") for _ in range(6))
            for _ in range(n)
        )

    d1, d2, d3 = doc(60), doc(60), doc(60)
    root = tempfile.mkdtemp(prefix="snda")
    land = os.path.join(root, "land")
    idx = os.path.join(root, "index")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    try:
        os.makedirs(land)
        _land(land, spark, [(1, d1), (2, d2)], "a")
        q = streaming_near_dedup_admission(
            spark.readStream.schema(SCHEMA).parquet(land + "/*"),
            idx, out, ckpt,
        )
        q.awaitTermination(120)
        got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
        assert got[1]["kept"] is True and got[2]["kept"] is True

        # batch 2: a tail-edit of d1 plus a new doc
        _land(land, spark, [(10, d1 + " tiny edit"), (11, d3)], "b")
        q2 = streaming_near_dedup_admission(
            spark.readStream.schema(SCHEMA).parquet(land + "/*"),
            idx, out, ckpt,
        )
        q2.awaitTermination(120)
        got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
        assert got[10]["kept"] is False
        assert got[10]["dup_of_seen"] == 1
        assert got[11]["kept"] is True

        # batch 3: near-copy of the batch-2 ADMITTED doc is also caught
        _land(land, spark, [(20, d3 + " more tail")], "c")
        q3 = streaming_near_dedup_admission(
            spark.readStream.schema(SCHEMA).parquet(land + "/*"),
            idx, out, ckpt,
        )
        q3.awaitTermination(120)
        got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
        assert got[20]["kept"] is False and got[20]["dup_of_seen"] == 11
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_near_dedup_admission_forced_replay_is_clean(spark):
    """Crash-replay contract: replaying the last completed batch must
    NOT screen the batch against its own index slice (it would reject
    every resubmitted doc as a duplicate of itself and overwrite the
    slice empty — review finding, round 8), and decisions must not
    double-append."""
    import random

    from qualityassurancetool_spark.streaming.micro_batch import (
        streaming_near_dedup_admission,
    )

    rng = random.Random(7)

    def doc(n):
        return " ".join(
            "".join(rng.choice("abcdefghij") for _ in range(6))
            for _ in range(n)
        )

    root = tempfile.mkdtemp(prefix="snda_replay")
    land = os.path.join(root, "land")
    idx = os.path.join(root, "index")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    try:
        os.makedirs(land)
        _land(land, spark, [(1, doc(60)), (2, doc(60))], "a")
        q = streaming_near_dedup_admission(
            spark.readStream.schema(SCHEMA).parquet(land + "/*"),
            idx, out, ckpt,
        )
        q.awaitTermination(120)
        want = {
            (r["doc_id"], r["kept"])
            for r in spark.read.parquet(out).collect()
        }
        assert want == {(1, True), (2, True)}
        n_index = spark.read.parquet(os.path.join(idx, "batch=0")).count()
        assert n_index > 0

        # force a replay of the completed batch (delete its commit
        # marker — the recovery path after a crash post-index-write)
        commits = os.path.join(ckpt, "commits")
        last = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
        os.remove(os.path.join(commits, last))
        crc = os.path.join(commits, f".{last}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        q2 = streaming_near_dedup_admission(
            spark.readStream.schema(SCHEMA).parquet(land + "/*"),
            idx, out, ckpt,
        )
        q2.awaitTermination(120)
        got = {
            (r["doc_id"], r["kept"])
            for r in spark.read.parquet(out).collect()
        }
        assert got == want  # same decisions, no duplicates, still kept
        assert (
            spark.read.parquet(os.path.join(idx, "batch=0")).count()
            == n_index
        )  # index slice intact, not overwritten empty
    finally:
        shutil.rmtree(root, ignore_errors=True)

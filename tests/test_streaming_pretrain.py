"""Streaming pretraining capstone (streaming/pretrain_stream): the
micro-batch twin of plans/pretrain — exact dedup → curate → near-dup
admission → corpus slices, checkpointed, killed and restarted
mid-stream, a completed batch force-replayed (the foreachBatch recovery
contract), then finalized to shards that are BYTE-IDENTICAL to a pure
batch build over the same input."""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import shutil
import tempfile

from qualityassurancetool_spark.plans.curation import CurationConfig
from qualityassurancetool_spark.plans.pretrain import (
    PretrainConfig,
    run_pretrain_pipeline,
)
from qualityassurancetool_spark.streaming.pretrain_stream import (
    finalize_streaming_pretrain,
    read_admitted_corpus,
    streaming_pretrain_ingest,
)

SCHEMA = "doc_id long, text string, ingest_ts timestamp"
TS = dt.datetime(2024, 1, 1, 12, 0, 0)

_WORDS = (
    "river stone market lantern harbor meadow copper signal garden "
    "window thunder velvet anchor bridge forest castle mirror puzzle "
    "silver shadow branch hollow autumn winter spring summer evening "
    "morning journey station"
).split()


def _doc(i: int) -> str:
    """~40 words of deterministic, per-doc-distinct prose (md5-driven
    word choice so distinct docs share almost no shingles)."""
    h = hashlib.md5(f"doc{i}".encode()).digest()
    words = [
        _WORDS[(h[j % 16] + 7 * j + i * 13) % len(_WORDS)]
        for j in range(40)
    ]
    return f"document number {i} begins here " + " ".join(words)


DOCS = {i: _doc(i) for i in range(1, 9)}            # 8 keepers
DOCS[9] = DOCS[1]                                   # exact dup of 1
DOCS[10] = DOCS[2] + " with a tiny appended edit"   # near dup of 2
DOCS[11] = "zz zz zz zz zz zz zz zz zz zz zz zz"    # word_rep spam
DOCS[12] = DOCS[7] + " another small tail change"   # near dup of 7

FILE_A = [1, 2, 3]
FILE_B = [4, 5, 6, 9]          # 9: exact dup across batches
FILE_C = [7, 8, 10, 11, 12]    # 10: near dup across a RESTART;
                               # 12: near dup of 7 INSIDE the batch
CUR = {"max_word_rep_ratio": 0.5, "dedup": "exact"}
PRE = {
    "curation": CUR,
    "near_dedup": True,
    "minhash_threshold": 0.7,
    "chunk_tokens": 32,
    "overlap_tokens": 8,
    "pack_budget": 64,
    "n_shards": 2,
}


def _land(spark, land, ids, name):
    rows = [(i, DOCS[i], TS) for i in ids]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(land, name))


def _run_stream(spark, land, work, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(land + "/*")
    )
    q = streaming_pretrain_ingest(
        stream, CurationConfig.from_dict(CUR), work, ckpt
    )
    q.awaitTermination(180)


def _shard_bytes(shards_dir):
    out = {}
    for root, _dirs, files in os.walk(shards_dir):
        for f in sorted(files):
            if f.endswith(".tar"):
                out[f] = open(os.path.join(root, f), "rb").read()
    return out


def test_streaming_capstone_restart_replay_and_batch_parity(spark):
    root = tempfile.mkdtemp(prefix="spre")
    land = os.path.join(root, "land")
    work = os.path.join(root, "work")
    ckpt = os.path.join(root, "ckpt")
    try:
        os.makedirs(land)
        # ---- run 1: files a+b drain as separate micro-batches --------
        _land(spark, land, FILE_A, "a")
        _land(spark, land, FILE_B, "b")
        _run_stream(spark, land, work, ckpt)
        admitted1 = {
            r["doc_id"] for r in read_admitted_corpus(spark, work).collect()
        }
        # 9 (exact dup of 1, LATER batch) died in watermark state
        assert admitted1 == {1, 2, 3, 4, 5, 6}

        # ---- mid-stream restart: new file, same checkpoint -----------
        _land(spark, land, FILE_C, "c")
        _run_stream(spark, land, work, ckpt)
        admitted2 = {
            r["doc_id"] for r in read_admitted_corpus(spark, work).collect()
        }
        # 10 rejected against the PERSISTED index (its twin admitted
        # before the restart); 11 fails curation; 12 is near-dup of 7
        # in the SAME batch → batch-atomic admission admits it (the
        # finalize step removes it)
        assert admitted2 == {1, 2, 3, 4, 5, 6, 7, 8, 12}

        # ---- forced replay of the last completed batch ---------------
        # (the foreachBatch recovery contract: same batch_id, same
        # input slice). Deleting its commit marker makes the next run
        # re-execute it; per-batch overwrite must keep outputs stable.
        commits = os.path.join(ckpt, "commits")
        last = max(
            (f for f in os.listdir(commits) if f.isdigit()), key=int
        )
        os.remove(os.path.join(commits, last))
        crc = os.path.join(commits, f".{last}.crc")
        if os.path.exists(crc):  # local checksum-FS sidecar
            os.remove(crc)
        _run_stream(spark, land, work, ckpt)
        assert {
            r["doc_id"] for r in read_admitted_corpus(spark, work).collect()
        } == admitted2
        # decisions did not double-append either
        dec = spark.read.parquet(
            *[
                os.path.join(work, "decisions", d)
                for d in os.listdir(os.path.join(work, "decisions"))
            ]
        )
        assert dec.count() == dec.select("doc_id").distinct().count()

        # ---- idle restart: nothing new → nothing changes -------------
        _run_stream(spark, land, work, ckpt)
        assert {
            r["doc_id"] for r in read_admitted_corpus(spark, work).collect()
        } == admitted2

        # ---- finalize vs the pure-batch twin: byte-identical ---------
        cfg = PretrainConfig.from_dict(PRE)
        rep_s = finalize_streaming_pretrain(
            spark, work, cfg, os.path.join(root, "out_stream")
        )
        batch_docs = spark.createDataFrame(
            [(i, DOCS[i]) for i in sorted(DOCS)], "doc_id long, text string"
        )
        rep_b = run_pretrain_pipeline(
            batch_docs, cfg, os.path.join(root, "out_batch")
        )
        assert rep_s["n_chunks"] == rep_b["n_chunks"] > 0
        sb = _shard_bytes(os.path.join(root, "out_stream", "shards"))
        bb = _shard_bytes(os.path.join(root, "out_batch", "shards"))
        assert sb.keys() == bb.keys() and len(sb) == 2
        for name in sb:
            assert sb[name] == bb[name], f"shard {name} differs"
    finally:
        shutil.rmtree(root, ignore_errors=True)

"""Streaming MinHash admission (streaming/minhash_stream): micro-batch
near-dedup against a bootstrap state + all previous batches, checkpoint
kill/restart, a completed batch force-replayed (the foreachBatch
recovery contract), and the accumulated pairs compared against the
monolithic batch pipeline over the same documents."""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.dedup import (
    minhash_dedup,
    minhash_dedup_batched,
)
from qualityassurancetool_spark.streaming.minhash_stream import (
    read_admitted_pairs,
    streaming_minhash_admit,
)

SCHEMA = "doc_id long, text string, ingest_ts timestamp"
TS = dt.datetime(2024, 1, 1, 12, 0, 0)

_WORDS = (
    "river stone market lantern harbor meadow copper signal garden "
    "window thunder velvet anchor bridge forest castle mirror puzzle"
).split()


def _doc(i: int) -> str:
    h = hashlib.md5(f"mh{i}".encode()).digest()
    words = [
        _WORDS[(h[j % 16] + 5 * j + i * 11) % len(_WORDS)]
        for j in range(30)
    ]
    return f"minhash doc {i} starts " + " ".join(words)


BASE_IDS = [0, 1, 2, 3]
DOCS = {i: _doc(i) for i in BASE_IDS}
DOCS.update({i: _doc(i) for i in (10, 11, 12)})
DOCS[13] = DOCS[0]                          # batch A: exact dup of BASE 0
DOCS[14] = DOCS[11] + " tiny tail edit"     # batch A: near dup inside A
DOCS.update({i: _doc(i) for i in (20, 21)})
DOCS[22] = DOCS[11]                         # batch B: exact dup of A's 11
FILE_A = [10, 11, 12, 13, 14]
FILE_B = [20, 21, 22]
KW = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.5)


def _land(spark, land, ids, name):
    rows = [(i, DOCS[i], TS) for i in ids]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(land, name))


def _run(spark, land, state, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(land + "/*")
    )
    q = streaming_minhash_admit(
        stream, state, ckpt, hash_mode="portable", **KW
    )
    q.awaitTermination(180)


def _pairs(spark, state):
    return {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in read_admitted_pairs(spark, state).collect()
    }


def test_streaming_admission_restart_replay_and_batch_parity(spark):
    root = tempfile.mkdtemp(prefix="smh")
    land = os.path.join(root, "land")
    state = os.path.join(root, "state")
    ckpt = os.path.join(root, "ckpt")
    try:
        os.makedirs(land)
        # bootstrap state from the base corpus (same knobs)
        base = spark.createDataFrame(
            [(i, DOCS[i]) for i in BASE_IDS], "doc_id long, text string"
        )
        minhash_dedup_batched(
            base, state, hash_mode="portable", **KW
        ).count()

        # ---- batch A drains ------------------------------------------
        _land(spark, land, FILE_A, "a")
        _run(spark, land, state, ckpt)
        got_a = _pairs(spark, state)
        assert (0, 13) in {(a, b) for a, b, _ in got_a}   # vs BOOTSTRAP
        assert (11, 14) in {(a, b) for a, b, _ in got_a}  # inside A

        # ---- kill/restart with a new file ----------------------------
        _land(spark, land, FILE_B, "b")
        _run(spark, land, state, ckpt)
        got = _pairs(spark, state)
        assert (11, 22) in {(a, b) for a, b, _ in got}    # vs PREVIOUS batch

        # ---- parity: union of batch pairs == monolithic pipeline over
        # (base ∪ streamed) restricted to pairs touching a streamed doc
        all_docs = spark.createDataFrame(
            [(i, DOCS[i]) for i in sorted(DOCS)], "doc_id long, text string"
        )
        streamed = set(FILE_A) | set(FILE_B)
        want = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in minhash_dedup(
                all_docs, hash_mode="portable", **KW
            ).collect()
            if r["id_a"] in streamed or r["id_b"] in streamed
        }
        assert got == want and len(want) >= 3

        # ---- forced replay of the last completed batch ----------------
        commits = os.path.join(ckpt, "commits")
        last = max(
            (f for f in os.listdir(commits) if f.isdigit()), key=int
        )
        os.remove(os.path.join(commits, last))
        crc = os.path.join(commits, f".{last}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        _run(spark, land, state, ckpt)
        assert _pairs(spark, state) == got  # overwrite, no double rows

        # ---- idle restart: nothing new → nothing changes --------------
        _run(spark, land, state, ckpt)
        assert _pairs(spark, state) == got

        # ---- candidate scratch is cleaned per batch: only real
        # "batch=N" signature slices remain under sig_batches (a
        # long-running stream must not accumulate one dead *_cand dir
        # per micro-batch — review finding, round 8)
        sig_batches = os.path.join(state, "sig_batches")
        leftovers = [
            d for d in os.listdir(sig_batches) if d.endswith("_cand")
        ]
        assert leftovers == []
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_cold_stream_no_bootstrap(spark):
    """A stream with NO bootstrap state: the first batch verifies only
    delta-vs-delta; later batches see earlier ones."""
    root = tempfile.mkdtemp(prefix="smh_cold")
    land = os.path.join(root, "land")
    state = os.path.join(root, "state")
    ckpt = os.path.join(root, "ckpt")
    try:
        os.makedirs(land)
        _land(spark, land, FILE_A, "a")
        _run(spark, land, state, ckpt)
        got = {(a, b) for a, b, _ in _pairs(spark, state)}
        assert (11, 14) in got
        assert not any(x in (0, 1, 2, 3) for p in got for x in p)

        _land(spark, land, FILE_B, "b")
        _run(spark, land, state, ckpt)
        got = {(a, b) for a, b, _ in _pairs(spark, state)}
        assert (11, 22) in got
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_cold_stream_bakes_and_enforces_meta(spark):
    """A stream-created state must not escape knob enforcement: the
    cold start writes minhash_meta.json (per-batch admission never
    does — update_state=False), and a later run with different knobs
    raises instead of banding incomparable signatures (review finding,
    round 8)."""
    import pytest

    root = tempfile.mkdtemp(prefix="smh_meta")
    land = os.path.join(root, "land")
    state = os.path.join(root, "state")
    ckpt = os.path.join(root, "ckpt")
    try:
        os.makedirs(land)
        _land(spark, land, FILE_A, "a")
        _run(spark, land, state, ckpt)
        assert os.path.exists(os.path.join(state, "minhash_meta.json"))
        with pytest.raises(ValueError, match="knob mismatch"):
            streaming_minhash_admit(
                spark.readStream.schema("doc_id long, text string")
                .parquet(land + "/*"),
                state,
                os.path.join(root, "ckpt2"),
                num_hashes=16,
                bands=4,  # state was baked with KW's bands=8
                shingle_k=KW["shingle_k"],
                threshold=KW["threshold"],
                hash_mode="portable",
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_streaming_admission_slim_bootstrap(spark):
    """A SLIM bootstrap state (store_shingles=False) streams admissions
    when corpus_text= is supplied — per-batch pairs identical to the
    full-storage stream over the same files; without corpus_text the
    query refuses at construction (not three micro-batches in)."""
    import pytest

    root = tempfile.mkdtemp(prefix="smh_slim")
    land = os.path.join(root, "land")
    state = os.path.join(root, "state")
    ckpt = os.path.join(root, "ckpt")
    try:
        os.makedirs(land)
        base = spark.createDataFrame(
            [(i, DOCS[i]) for i in BASE_IDS], "doc_id long, text string"
        )
        minhash_dedup_batched(
            base, state, hash_mode="portable", store_shingles=False, **KW
        ).count()
        _land(spark, land, FILE_A, "a")
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(land + "/*")
        )
        with pytest.raises(ValueError, match="corpus_text"):
            streaming_minhash_admit(
                stream, state, ckpt, hash_mode="portable", **KW
            )
        q = streaming_minhash_admit(
            stream, state, ckpt, hash_mode="portable",
            corpus_text=base, **KW
        )
        q.awaitTermination(180)
        _land(spark, land, FILE_B, "b")
        q = streaming_minhash_admit(
            (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(land + "/*")
            ),
            state, ckpt, hash_mode="portable", corpus_text=base, **KW,
        )
        q.awaitTermination(180)
        got = _pairs(spark, state)
        assert (0, 13) in {(a, b) for a, b, _ in got}   # vs slim BOOTSTRAP
        assert (11, 22) in {(a, b) for a, b, _ in got}  # vs previous batch
        all_docs = spark.createDataFrame(
            [(i, DOCS[i]) for i in sorted(DOCS)], "doc_id long, text string"
        )
        streamed = set(FILE_A) | set(FILE_B)
        want = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in minhash_dedup(
                all_docs, hash_mode="portable", **KW
            ).collect()
            if r["id_a"] in streamed or r["id_b"] in streamed
        }
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)

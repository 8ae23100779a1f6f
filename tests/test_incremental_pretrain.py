"""Incremental corpus builds (plans/incremental): snapshot-digest diff
→ changed-set-only curation + admission → latest-wins current view →
batch-identical finalize.  Exercises added / changed / removed /
revision-withdrawn / cross-update near-dup, and proves the final shards
are byte-identical to a from-scratch batch build on the final
snapshot."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from qualityassurancetool_spark.plans.curation import CurationConfig
from qualityassurancetool_spark.plans.incremental import (
    current_corpus,
    finalize_incremental,
    incremental_update,
)
from qualityassurancetool_spark.plans.pretrain import (
    PretrainConfig,
    run_pretrain_pipeline,
)

_WORDS = (
    "river stone market lantern harbor meadow copper signal garden "
    "window thunder velvet anchor bridge forest castle mirror puzzle "
    "silver shadow branch hollow autumn winter spring summer evening "
    "morning journey station"
).split()


def _doc(seed: str) -> str:
    h = hashlib.md5(seed.encode()).digest()
    words = [
        _WORDS[(h[j % 16] + 7 * j + h[15] * 13) % len(_WORDS)]
        for j in range(40)
    ]
    return f"snapshot doc {seed} starts " + " ".join(words)


SPAM = "zz zz zz zz zz zz zz zz zz zz zz zz"
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

S0 = {i: _doc(f"v1-{i}") for i in range(1, 7)}
S1 = dict(S0)
S1.update({
    7: _doc("v1-7"),
    8: _doc("v1-8"),
    9: S0[3] + " tiny appended tail",  # near-dup of doc 3 -> rejected
    10: SPAM,                          # fails curation
})
S2 = dict(S1)
del S2[4]                              # removed
S2[5] = _doc("v2-5")                   # revised, still good
S2[6] = SPAM                           # revised into spam -> withdrawn
S2[11] = _doc("v1-11")                 # added


def _df(spark, snap):
    return spark.createDataFrame(
        sorted(snap.items()), "doc_id long, text string"
    )


def _shard_bytes(shards_dir):
    out = {}
    for root, _d, files in os.walk(shards_dir):
        for f in sorted(files):
            if f.endswith(".tar"):
                out[f] = open(os.path.join(root, f), "rb").read()
    return out


def test_incremental_equals_batch_rebuild(spark):
    root = tempfile.mkdtemp(prefix="incr")
    state = os.path.join(root, "state")
    cfg = CurationConfig.from_dict(CUR)
    try:
        r0 = incremental_update(spark, _df(spark, S0), cfg, state)
        assert r0["update"] == 0
        assert r0["diff"] == {"added": 6}
        assert r0["processed"] == 6 and r0["admitted"] == 6

        r1 = incremental_update(spark, _df(spark, S1), cfg, state)
        assert r1["diff"] == {"unchanged": 6, "added": 4}
        assert r1["processed"] == 4  # ONLY the changed set flows
        assert r1["admitted"] == 2   # 7, 8 (9 near-dup, 10 spam)

        r2 = incremental_update(spark, _df(spark, S2), cfg, state)
        assert r2["diff"] == {
            "unchanged": 7, "added": 1, "changed": 2, "removed": 1,
        }
        assert r2["processed"] == 3  # 5(rev), 6(rev), 11
        assert r2["admitted"] == 2   # 5(new), 11 — spam 6 withdrawn

        cur = {
            r["doc_id"]: r["text"]
            for r in current_corpus(spark, state).collect()
        }
        assert set(cur) == {1, 2, 3, 5, 7, 8, 11}
        assert cur[5] == S2[5]  # latest-wins took the revision

        # re-running the SAME snapshot is a no-op (all unchanged)
        r3 = incremental_update(spark, _df(spark, S2), cfg, state)
        assert r3["processed"] == 0 and r3["admitted"] == 0
        assert set(
            r["doc_id"] for r in current_corpus(spark, state).collect()
        ) == {1, 2, 3, 5, 7, 8, 11}

        # finalize ≡ from-scratch batch build on the FINAL snapshot
        pcfg = PretrainConfig.from_dict(PRE)
        rep_i = finalize_incremental(
            spark, state, pcfg, os.path.join(root, "out_incr")
        )
        rep_b = run_pretrain_pipeline(
            _df(spark, S2), pcfg, os.path.join(root, "out_batch")
        )
        assert rep_i["n_chunks"] == rep_b["n_chunks"] > 0
        si = _shard_bytes(os.path.join(root, "out_incr", "shards"))
        sb = _shard_bytes(os.path.join(root, "out_batch", "shards"))
        assert si.keys() == sb.keys() and len(si) == 2
        for name in si:
            assert si[name] == sb[name], f"shard {name} differs"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_revision_with_small_edit_is_readmitted(spark):
    """A lightly-edited revision of an admitted doc must NOT be
    near-dup-rejected against its own prior fingerprints (review
    finding: without self-id exclusion every small edit permanently
    withdrew the doc via the latest-wins view)."""
    root = tempfile.mkdtemp(prefix="incr_rev")
    state = os.path.join(root, "state")
    cfg = CurationConfig.from_dict(CUR)
    try:
        a = {1: _doc("rev-1"), 2: _doc("rev-2")}
        incremental_update(spark, _df(spark, a), cfg, state)
        b = dict(a)
        b[1] = a[1] + " one small appended clause"
        r = incremental_update(spark, _df(spark, b), cfg, state)
        assert r["diff"] == {"unchanged": 1, "changed": 1}
        assert r["processed"] == 1 and r["admitted"] == 1
        cur = {
            row["doc_id"]: row["text"]
            for row in current_corpus(spark, state).collect()
        }
        assert cur[1] == b[1]  # the revision, not a withdrawal
        # but a DIFFERENT doc that is a near-copy of doc 2 still rejects
        c = dict(b)
        c[3] = a[2] + " tiny tail"
        r2 = incremental_update(spark, _df(spark, c), cfg, state)
        assert r2["processed"] == 1 and r2["admitted"] == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_crash_replay_reuses_update_id(spark):
    """The WORST crash window (review finding): every upd=1 artifact is
    on disk — slices AND the new seen digests — but the commit marker
    never advanced.  The replay must re-diff against the COMMITTED
    digests (upd=0), reprocess the same work under the SAME upd id,
    not reject docs against their own half-written fingerprints, and
    current_corpus must never have served the uncommitted slice."""
    root = tempfile.mkdtemp(prefix="incr_crash")
    state = os.path.join(root, "state")
    cfg = CurationConfig.from_dict(CUR)
    try:
        a = {1: _doc("cr-1"), 2: _doc("cr-2")}
        incremental_update(spark, _df(spark, a), cfg, state)
        marker = os.path.join(state, "LAST_COMMITTED")
        marker_val = open(marker).read()

        b = dict(a)
        b[3] = _doc("cr-3")
        incremental_update(spark, _df(spark, b), cfg, state)
        # simulate the crash: ONLY the marker write was lost — slices
        # and seen/upd=1 digests all exist
        open(marker, "w").write(marker_val)

        # an uncommitted update is invisible to readers
        assert {
            row["doc_id"] for row in current_corpus(spark, state).collect()
        } == {1, 2}

        r = incremental_update(spark, _df(spark, b), cfg, state)
        assert r["update"] == 1  # SAME id, not a fresh one
        assert r["diff"] == {"unchanged": 2, "added": 1}  # vs COMMITTED
        assert r["processed"] == 1 and r["admitted"] == 1  # not rejected
        assert {
            row["doc_id"] for row in current_corpus(spark, state).collect()
        } == {1, 2, 3}
    finally:
        shutil.rmtree(root, ignore_errors=True)

"""End-to-end pretraining pipeline (plans/pretrain): documents →
curate → near-dedup → chunk+pack → WebDataset shards, with a coherent
audit report and deterministic re-runs."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest

from qualityassurancetool_spark.config import ConfigError
from qualityassurancetool_spark.plans.pretrain import (
    PretrainConfig,
    run_pretrain_pipeline,
)
from qualityassurancetool_spark.schema import load_table


def test_end_to_end_on_testdata(spark):
    out = tempfile.mkdtemp(prefix="pretrain")
    try:
        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        n_docs = docs.count()
        cfg = PretrainConfig.from_dict(
            {
                "curation": {"max_word_rep_ratio": 0.9, "dedup": "exact"},
                "minhash_threshold": 0.6,
                "chunk_tokens": 64,
                "overlap_tokens": 8,
                "pack_budget": 256,
                "n_shards": 4,
            }
        )
        report = run_pretrain_pipeline(docs, cfg, out)
        # audit coherence: every document got exactly one verdict
        assert sum(report["rules"].values()) == n_docs
        assert report["rules"].get("kept", 0) > 0
        # the corpus has planted duplicates: some rule killed them
        killed = {k: v for k, v in report["rules"].items() if k != "kept"}
        assert sum(killed.values()) > 0
        assert report["n_chunks"] > 0
        assert sum(report["shards"].values()) == report["n_chunks"]
        tars = glob.glob(os.path.join(out, "shards", "*.tar"))
        assert len(tars) == len(report["shards"])
        # decisions sheet is on disk for the audit trail
        back = spark.read.parquet(os.path.join(out, "decisions"))
        assert back.count() == n_docs

        # deterministic re-run: identical shard bytes
        before = {p: open(p, "rb").read() for p in tars}
        report2 = run_pretrain_pipeline(docs, cfg, out)
        assert report2 == report
        for p, blob in before.items():
            assert open(p, "rb").read() == blob
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_config_validation():
    with pytest.raises(ConfigError):
        PretrainConfig.from_dict({"output_format": "csv"})
    with pytest.raises(ConfigError):
        PretrainConfig.from_dict({"nope": 1})
    with pytest.raises(ConfigError):
        PretrainConfig.from_dict({"curation": {"bad_rule": 1}})


def test_band_batched_near_dedup_identical_report(spark):
    """minhash_band_batches routes near-dedup through the bounded-state
    schedule; the pipeline report (kill counts, chunks, shard manifest)
    must be identical to the monolithic run — the batching is a pure
    execution-schedule change."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    base = {
        "curation": {"max_word_rep_ratio": 0.9, "dedup": "exact"},
        "minhash_threshold": 0.6,
        "chunk_tokens": 64,
        "overlap_tokens": 8,
        "pack_budget": 256,
        "n_shards": 4,
    }
    out1 = tempfile.mkdtemp(prefix="pretrain_mono")
    out2 = tempfile.mkdtemp(prefix="pretrain_batched")
    try:
        r1 = run_pretrain_pipeline(
            docs, PretrainConfig.from_dict(base), out1
        )
        r2 = run_pretrain_pipeline(
            docs,
            PretrainConfig.from_dict(
                {**base, "minhash_band_batches": 2}
            ),
            out2,
        )
        assert r2 == r1
        assert os.path.isdir(os.path.join(out2, "minhash_work", "sig"))
        assert not os.path.isdir(os.path.join(out1, "minhash_work"))
    finally:
        shutil.rmtree(out1, ignore_errors=True)
        shutil.rmtree(out2, ignore_errors=True)


def test_near_dup_keeper_prefers_surviving_member(spark):
    """A near-dup cluster whose MIN-id member fails curation must keep
    a member that passes — min-id-always would drop the survivor as
    'near_duplicate' while its representative dies by its own rule,
    and the content vanishes entirely (review finding, round 8; same
    exemption curate's exact-dedup keeper has)."""
    base = (
        "plenty of clean readable prose words flowing through this "
        "document body with natural variety and calm structure"
    )
    rows = [
        # id 0: near-dup of id 1 but FAILS word_rep (spammy repetition)
        (0, base + " zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz"),
        (1, base + " tiny tail edit"),
        (2, "a completely different unrelated document about engines"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = tempfile.mkdtemp(prefix="pretrain_keeper")
    try:
        cfg = PretrainConfig.from_dict(
            {
                "curation": {"max_word_rep_ratio": 0.2, "dedup": "none"},
                "minhash_threshold": 0.4,
                "chunk_tokens": 64,
                "overlap_tokens": 8,
                "pack_budget": 256,
                "n_shards": 2,
                "output_format": "parquet",
            }
        )
        run_pretrain_pipeline(docs, cfg, out)
        dec = {
            r["doc_id"]: (r["keep"], r["drop_reason"])
            for r in spark.read.parquet(
                os.path.join(out, "decisions")
            ).collect()
        }
        assert dec[0] == (False, "word_rep")   # dies by its own rule
        assert dec[1][0] is True               # the SURVIVOR is kept
        assert dec[2][0] is True
    finally:
        shutil.rmtree(out, ignore_errors=True)

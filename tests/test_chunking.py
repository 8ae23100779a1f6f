"""Chunking + packing operators: boundary arithmetic, overlap
reconstruction, budget invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.chunking import (
    chunk_documents,
    pack_documents,
)


def _doc(n_tokens: int) -> str:
    return " ".join(f"t{i}" for i in range(n_tokens))


def test_chunk_boundaries_and_overlap(spark):
    df = spark.createDataFrame(
        [(1, _doc(10)), (2, _doc(3)), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=4, overlap_tokens=1)
    rows = {
        (r["doc_id"], r["chunk_idx"]): r for r in out.collect()
    }
    # doc 1: 10 tokens, stride 3 -> chunks at 0,3,6,9 => 1+ceil(6/3)=3? no:
    # 1 + ceil((10-4)/3) = 1 + 2 = 3 chunks at offsets 0,3,6 (last len 4)
    d1 = sorted(k[1] for k in rows if k[0] == 1)
    assert d1 == [0, 1, 2]
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[(1, 1)]["chunk_text"] == "t3 t4 t5 t6"   # 1-token overlap
    assert rows[(1, 2)]["chunk_text"] == "t6 t7 t8 t9"
    assert rows[(1, 2)]["n_chunk_tokens"] == 4
    # short doc: exactly one (partial) chunk
    assert sorted(k[1] for k in rows if k[0] == 2) == [0]
    assert rows[(2, 0)]["chunk_text"] == "t0 t1 t2"
    assert rows[(2, 0)]["n_chunk_tokens"] == 3
    # empty doc: one empty chunk, nothing crashes
    assert rows[(3, 0)]["n_chunk_tokens"] == 0


def test_chunk_covers_every_token(spark):
    df = spark.createDataFrame([(7, _doc(100))], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=16, overlap_tokens=4).collect()
    seen = set()
    for r in out:
        seen.update(r["chunk_text"].split())
    assert seen == {f"t{i}" for i in range(100)}
    # every full chunk has exactly chunk_tokens tokens
    for r in out:
        assert r["n_chunk_tokens"] <= 16


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


def test_pack_soft_budget_bound(spark):
    rows = [(i, 300 + (i * 97) % 500) for i in range(200)]  # 300..799 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_documents(df, budget_tokens=2048)
    per_pack = (
        out.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("total"), F.count("*").alias("n"))
        .collect()
    )
    # soft mode: total < budget + max doc tokens (straddling doc lands
    # in the earlier bucket)
    assert all(r["total"] < 2048 + 800 for r in per_pack)
    # dense ids starting at 0
    ids = sorted(r["pack_id"] for r in per_pack)
    assert ids == list(range(len(ids)))
    # determinism
    again = {
        (r["doc_id"]): r["pack_id"] for r in pack_documents(
            df, budget_tokens=2048
        ).collect()
    }
    first = {r["doc_id"]: r["pack_id"] for r in out.collect()}
    assert first == again


def test_pack_hard_budget_with_max_doc_tokens(spark):
    rows = [(i, 300 + (i * 97) % 500) for i in range(200)]  # ≤ 799 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_documents(df, budget_tokens=2048, max_doc_tokens=800)
    per_pack = (
        out.groupBy("pack_id").agg(F.sum("n_tokens").alias("total")).collect()
    )
    # hard mode: never exceeds the budget
    assert all(r["total"] <= 2048 for r in per_pack)
    # and packing is still useful (multiple docs per pack on average)
    n_docs = 200
    assert len(per_pack) < n_docs / 1.5
    with pytest.raises(ValueError):
        pack_documents(df, budget_tokens=512, max_doc_tokens=512)


def test_pack_partitioned(spark):
    rows = [(i, "en" if i % 2 else "de", 600) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = pack_documents(
        df, budget_tokens=1800, partition_cols=["lang"]
    )
    per = (
        out.groupBy("lang", "pack_id")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    assert all(r["t"] <= 1800 for r in per)
    # pack ids are dense within each language independently
    for lang in ("en", "de"):
        ids = sorted(r["pack_id"] for r in per if r["lang"] == lang)
        assert ids == list(range(len(ids)))


def test_pack_offsets(spark):
    """Offsets partition each pack: contiguous, starting at 0, and
    offset + n_tokens of the last row stays within budget."""
    from qualityassurancetool_spark.operators.chunking import (
        pack_documents,
        pack_offsets,
    )

    df = spark.createDataFrame(
        [(i, 30 + (i % 3) * 10) for i in range(40)],
        "doc_id long, n_tokens long",
    )
    packed = pack_documents(df, budget_tokens=128, max_doc_tokens=64)
    out = pack_offsets(packed)
    rows = sorted(
        (r["pack_id"], r["seq_idx"], r["pack_offset"], r["n_tokens"])
        for r in out.collect()
    )
    by_pack: dict[int, list] = {}
    for pid, sidx, off, n in rows:
        by_pack.setdefault(pid, []).append((sidx, off, n))
    for pid, seq in by_pack.items():
        assert [s for s, _, _ in seq] == list(range(len(seq)))
        run = 0
        for _, off, n in seq:
            assert off == run
            run += n
        assert run < 128  # hard budget with max_doc_tokens headroom

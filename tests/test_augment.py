"""T5-style span corruption (operators/augment): invariants and
determinism."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.augment import span_corruption

DOC = " ".join(f"w{i}" for i in range(60))


def _one(spark, p=0.15, salt="t5:"):
    df = spark.createDataFrame([(1, DOC)], "doc_id long, text string")
    return span_corruption(df, p_start=p, salt=salt).collect()[0]


def test_reconstruction_invariant(spark):
    """inputs + targets contain every original token exactly once, and
    sentinel K appears once in each side, in order."""
    r = _one(spark)
    assert r["n_spans"] > 0
    sent = re.compile(r"<extra_id_(\d+)>")
    in_ids = [int(m) for m in sent.findall(r["inputs"])]
    tg_ids = [int(m) for m in sent.findall(r["targets"])]
    assert in_ids == list(range(r["n_spans"]))
    assert tg_ids == in_ids
    kept = [t for t in r["inputs"].split() if not sent.match(t)]
    masked = [t for t in r["targets"].split() if not sent.match(t)]
    assert sorted(kept + masked) == sorted(DOC.split())
    assert len(masked) == r["n_masked_tokens"]


def test_deterministic_and_salt_independent(spark):
    a, b = _one(spark), _one(spark)
    assert (a["inputs"], a["targets"]) == (b["inputs"], b["targets"])
    c = _one(spark, salt="epoch2:")
    assert (a["inputs"], a["targets"]) != (c["inputs"], c["targets"])


def test_spans_never_touch(spark):
    """>= 1 unmasked token between sentinels (the no-adjacent rule that
    keeps sentinels meaningful)."""
    r = _one(spark, p=0.5)  # aggressive masking still obeys gaps
    toks = r["inputs"].split()
    for i in range(len(toks) - 1):
        assert not (
            toks[i].startswith("<extra_id_")
            and toks[i + 1].startswith("<extra_id_")
        )


def test_edge_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two tokens")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_corruption(df).collect()}
    assert out[1]["inputs"] == "" and out[1]["targets"] == ""
    for i in (2, 3):
        assert out[i]["n_masked_tokens"] + len(
            [t for t in out[i]["inputs"].split() if "<" not in t]
        ) == len(["one"] if i == 2 else ["two", "tokens"])


def test_no_python_stage(spark):
    df = spark.createDataFrame([(1, DOC)], "doc_id long, text string")
    plan = (
        span_corruption(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_fim_reconstruction_and_rate(spark):
    """PSM pieces reassemble the original; pass-through docs unchanged;
    fim_rate=0 and 1 behave as promised."""
    from qualityassurancetool_spark.operators.augment import fim_transform

    docs = [(i, " ".join(f"t{j}" for j in range(20))) for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = fim_transform(df, fim_rate=1.0).collect()
    for r in out:
        assert r["is_fim"] is True
        body = r["fim_text"]
        pre = body.split("<fim_prefix>")[1].split("<fim_suffix>")[0].split()
        suf = body.split("<fim_suffix>")[1].split("<fim_middle>")[0].split()
        mid = body.split("<fim_middle>")[1].split()
        assert pre + mid + suf == docs[0][1].split()
    none = fim_transform(df, fim_rate=0.0).collect()
    assert all(r["is_fim"] is False for r in none)
    assert none[0]["fim_text"] == docs[0][1]
    # intermediate rate: some of each, deterministic across calls
    a = {r["doc_id"]: r["is_fim"] for r in fim_transform(df, fim_rate=0.5).collect()}
    b = {r["doc_id"]: r["is_fim"] for r in fim_transform(df, fim_rate=0.5).collect()}
    assert a == b and any(a.values()) and not all(a.values())

"""Semantic (embedding-space) decontamination
(operators/decontam.semantic_decontaminate).
Cross-engine parity: tools/extra_oracles.py::x_semantic_decontam."""

import math
import random

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.decontam import (
    semantic_decontaminate,
)


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_matches_python_reference_and_flags(spark):
    rng = random.Random(2)
    corpus = [(i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(80)]
    bench = [(100, corpus[3][1]), (101, [rng.gauss(0, 1) for _ in range(6)]),
             (102, [2.0 * x for x in corpus[7][1]])]
    df = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(df, bench, threshold=0.999).collect()
    }
    for i, v in corpus:
        want = max(_cos(v, bv) for _, bv in bench)
        assert out[i]["max_sim"] == pytest.approx(want, abs=1e-12)
    # exact copy and scaled copy both flag; scaling is invisible to cosine
    assert out[3]["contaminated"] and out[3]["matched_bench_id"] == 100
    assert out[7]["contaminated"] and out[7]["matched_bench_id"] == 102
    assert sum(1 for r in out.values() if r["contaminated"]) == 2


def test_tie_break_min_bench_id(spark):
    v = [1.0, 0.0]
    df = spark.createDataFrame([(0, v)], "vec_id long, embedding array<double>")
    out = semantic_decontaminate(
        df, [(9, v), (4, v), (7, v)], threshold=0.5
    ).collect()[0]
    assert out["matched_bench_id"] == 4


def test_validation(spark):
    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        semantic_decontaminate(df, [])
    with pytest.raises(ValueError, match="zero-norm"):
        semantic_decontaminate(df, [(1, [0.0, 0.0])])


def test_gemm_strategy_parity(spark):
    rng = random.Random(9)
    corpus = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(300)]
    bench = [(50 + j, [rng.gauss(0, 1) for _ in range(8)]) for j in range(6)]
    df = spark.createDataFrame(
        corpus, "vec_id long, embedding array<double>"
    ).repartition(8)
    cols = ["vec_id", "max_sim", "matched_bench_id", "contaminated"]
    a = {
        r["vec_id"]: r
        for r in semantic_decontaminate(df, bench, 0.5, strategy="column")
        .select(cols).collect()
    }
    b = {
        r["vec_id"]: r
        for r in semantic_decontaminate(df, bench, 0.5, strategy="gemm")
        .select(cols).collect()
    }
    for i in a:
        assert a[i]["max_sim"] == pytest.approx(b[i]["max_sim"], abs=1e-12)
        assert a[i]["matched_bench_id"] == b[i]["matched_bench_id"]
        assert a[i]["contaminated"] == b[i]["contaminated"]
    with pytest.raises(ValueError):
        semantic_decontaminate(df, bench, 0.5, strategy="nope")


def test_zero_norm_corpus_rows_contract_both_strategies(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    bench = [(7, [1.0, 0.0])]
    for strat in ("column", "gemm"):
        got = {
            r["vec_id"]: r
            for r in semantic_decontaminate(
                df, bench, 0.9, strategy=strat
            ).collect()
        }
        assert got[0]["contaminated"] is True
        assert got[1]["max_sim"] is None, strat
        assert got[1]["matched_bench_id"] is None, strat
        assert got[1]["contaminated"] is False, strat


def test_null_and_ragged_rows_divert_both_strategies(spark):
    """Null AND wrong-length embeddings follow the null/null/False
    contract instead of crashing the scan — a single ragged row aborted
    the whole GEMM batch via np.stack (review finding, round 9)."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [1.0, 0.0, 5.0]), (3, [])],
        "vec_id long, embedding array<double>",
    )
    bench = [(7, [1.0, 0.0])]
    for strat in ("column", "gemm"):
        got = {
            r["vec_id"]: r
            for r in semantic_decontaminate(
                df, bench, 0.9, strategy=strat
            ).collect()
        }
        assert got[0]["contaminated"] is True
        for bad_id in (1, 2, 3):
            assert got[bad_id]["max_sim"] is None, (strat, bad_id)
            assert got[bad_id]["matched_bench_id"] is None, (strat, bad_id)
            assert got[bad_id]["contaminated"] is False, (strat, bad_id)

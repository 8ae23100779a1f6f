"""ExactSubstr-style duplicated-span removal (operators/span_dedup):
keep-first semantics, span merging, edge cases."""

from __future__ import annotations

from qualityassurancetool_spark.operators.span_dedup import (
    duplicated_span_dedup,
)

L = 5


def _run(spark, rows, mode="portable"):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in duplicated_span_dedup(
            df, window_tokens=L, hash_mode=mode
        ).collect()
    }


BASE = [
    (1, "a b c d e f g h i j k l m n o p"),
    (2, "x y a b c d e f g h i j z w"),   # contains doc1's 10-token prefix
    (3, "q r s t u v"),                    # unique, untouched
    (4, ""),                               # empty
    (5, "a b c d e f g h i j k l m n o p"),  # exact dup of doc1
]


def test_keep_first_and_span_merge(spark):
    out = _run(spark, BASE)
    # doc1 is the global first occurrence of every duplicated window
    assert out[1]["deduped"] == BASE[0][1]
    assert out[1]["n_tokens_removed"] == 0
    # doc2: the 10 shared tokens collapse into ONE merged span
    assert out[2]["deduped"] == "x y z w"
    assert out[2]["n_tokens_removed"] == 10
    assert out[2]["n_spans"] == 1
    # unique and empty docs pass through
    assert out[3]["deduped"] == BASE[2][1]
    assert out[4]["deduped"] == ""
    # exact duplicate: fully removed
    assert out[5]["deduped"] == ""
    assert out[5]["n_tokens_removed"] == 16


def test_within_doc_repeat_removed(spark):
    """A document repeating its own L-token run keeps only the first
    copy (within-doc duplication is duplication)."""
    run = "p q r s t"
    out = _run(spark, [(1, f"{run} m n o {run}")])
    assert out[1]["deduped"] == f"{run} m n o"
    assert out[1]["n_tokens_removed"] == L
    assert out[1]["n_spans"] == 1


def test_disjoint_spans_stay_separate(spark):
    a, b = "a1 a2 a3 a4 a5", "b1 b2 b3 b4 b5"
    rows = [
        (1, f"{a} gap1 gap2 {b}"),
        (2, f"{a} other filler words here {b}"),
    ]
    out = _run(spark, rows)
    assert out[2]["n_spans"] == 2
    assert out[2]["deduped"] == "other filler words here"


def test_fast_mode_matches_portable_structure(spark):
    por = _run(spark, BASE, "portable")
    fast = _run(spark, BASE, "fast")
    for k in por:
        assert por[k]["deduped"] == fast[k]["deduped"], k
        assert por[k]["n_spans"] == fast[k]["n_spans"], k


def test_no_python_stage(spark):
    df = spark.createDataFrame(BASE, "doc_id long, text string")
    plan = (
        duplicated_span_dedup(df, window_tokens=L)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_batched_schedule_matches_monolithic(spark, tmp_path):
    """The hash-sliced schedule emits the monolithic output EXACTLY
    (keep-first is per hash; slices partition the hash space), for both
    hash modes and degenerate hash_batches=1."""
    from qualityassurancetool_spark.operators.span_dedup import (
        duplicated_span_dedup_batched,
    )

    df = spark.createDataFrame(BASE, "doc_id long, text string")
    for mode in ("portable", "fast"):
        want = {
            (r["doc_id"], r["deduped"], r["n_tokens_removed"], r["n_spans"])
            for r in duplicated_span_dedup(
                df, window_tokens=L, hash_mode=mode
            ).collect()
        }
        for nb in (1, 3):
            work = str(tmp_path / f"spans_{mode}_{nb}")
            got = {
                (
                    r["doc_id"], r["deduped"],
                    r["n_tokens_removed"], r["n_spans"],
                )
                for r in duplicated_span_dedup_batched(
                    df, work, window_tokens=L, hash_mode=mode,
                    hash_batches=nb,
                ).collect()
            }
            assert got == want, (mode, nb)


def test_batched_validation(spark, tmp_path):
    import pytest

    from qualityassurancetool_spark.operators.span_dedup import (
        duplicated_span_dedup_batched,
    )

    df = spark.createDataFrame(BASE, "doc_id long, text string")
    with pytest.raises(ValueError, match="hash_batches"):
        duplicated_span_dedup_batched(
            df, str(tmp_path / "w"), hash_batches=0
        )

"""q-gram Jaccard fuzzy string join (operators/fuzzy_join).
Cross-engine parity: tools/extra_oracles.py::x_fuzzy_join."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.fuzzy_join import (
    fuzzy_string_join,
    qgrams,
)


def _py_qgrams(s, q=3):
    s = " ".join(s.lower().split()).replace("\x01", "")
    p = "\x01" * (q - 1) + s + "\x01" * (q - 1)
    return {p[i : i + q] for i in range(len(p) - q + 1)}


def _jac(a, b):
    return len(a & b) / len(a | b)


def test_qgrams_match_python_reference(spark):
    rows = [(0, "John  Smith"), (1, "x"), (2, "ABC abc")]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        r["id"]: set(r["g"])
        for r in df.select("id", qgrams(F.col("s")).alias("g")).collect()
    }
    for i, s in rows:
        assert got[i] == _py_qgrams(s)


def test_join_equals_naive_jaccard(spark):
    names_l = ["john smith", "jane doe", "acme corp", "quality tool"]
    names_r = ["jon smith", "jane m doe", "acme corporation", "zzz"]
    left = spark.createDataFrame(list(enumerate(names_l)), ["left_id", "s"])
    right = spark.createDataFrame(
        [(100 + i, s) for i, s in enumerate(names_r)], ["right_id", "t"]
    )
    TH = 0.4
    got = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in fuzzy_string_join(
            left, right, "s", "t", threshold=TH
        ).collect()
    }
    want = {
        (i, 100 + j): _jac(_py_qgrams(a), _py_qgrams(b))
        for i, a in enumerate(names_l)
        for j, b in enumerate(names_r)
        if _jac(_py_qgrams(a), _py_qgrams(b)) >= TH
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])
    assert (0, 100) in got  # john smith ~ jon smith survives


def test_hot_gram_cap_bounds_candidates(spark):
    # every right string shares the hot padding-free gram "aaa"; with
    # max_df=2 those grams generate no candidates
    left = spark.createDataFrame([(0, "aaa")], ["left_id", "s"])
    right = spark.createDataFrame(
        [(i, "aaa") for i in range(5)], ["right_id", "t"]
    )
    assert (
        fuzzy_string_join(
            left, right, "s", "t", threshold=0.1, max_df=2
        ).count()
        == 0
    )
    assert (
        fuzzy_string_join(
            left, right, "s", "t", threshold=0.1, max_df=None
        ).count()
        == 5
    )


def test_validation(spark):
    df = spark.createDataFrame([(0, "x")], ["left_id", "s"])
    r = spark.createDataFrame([(0, "x")], ["right_id", "t"])
    with pytest.raises(ValueError):
        fuzzy_string_join(df, r, "s", "t", threshold=0.0)
    with pytest.raises(ValueError):
        fuzzy_string_join(df, r, "s", "t", q=1)


def test_sentinel_char_in_input_cannot_forge_boundary_grams(spark):
    """A literal \\x01 inside input text is stripped before padding, so
    it cannot collide with the boundary sentinel (review finding)."""
    left = spark.createDataFrame([(0, "a\x01\x01")], ["left_id", "s"])
    right = spark.createDataFrame([(0, "zzz")], ["right_id", "t"])
    # 'a\x01\x01' reduces to 'a' → grams identical to plain 'a'
    gl = {r["g"] for r in left.select(
        F.explode(qgrams(F.col("s"))).alias("g")).collect()}
    assert gl == _py_qgrams("a")
    assert fuzzy_string_join(left, right, "s", "t", 0.1).count() == 0


def test_max_df_jaccard_consistent_over_reduced_universe(spark):
    """When max_df trims hot grams, per-side set sizes are recomputed
    over the reduced gram universe, so near-identical strings sharing a
    hot gram still score ~1 instead of being penalized for grams that
    can never count as common (ADVICE r3)."""
    # 'the acme corp' appears on 4 right rows → its grams are hot at
    # max_df=3; the left twin must still match its right twin with
    # jaccard computed over the surviving (non-hot) grams only.
    right_rows = [(100 + i, f"the acme corp {chr(97 + i)}x") for i in range(4)]
    left = spark.createDataFrame(
        [(0, "the acme corp ax")], ["left_id", "s"]
    )
    right = spark.createDataFrame(right_rows, ["right_id", "t"])
    out = {
        (r["left_id"], r["right_id"]): (r["n_common"], r["jaccard"])
        for r in fuzzy_string_join(
            left, right, "s", "t", threshold=0.1, max_df=3
        ).collect()
    }
    # python reference: reduced universe = grams minus those with
    # right-side df > 3
    import collections

    rg = {rid: _py_qgrams(t) for rid, t in right_rows}
    df_count = collections.Counter(g for gs in rg.values() for g in gs)
    hot = {g for g, c in df_count.items() if c > 3}
    lred = _py_qgrams("the acme corp ax") - hot
    for rid, t in right_rows:
        rred = rg[rid] - hot
        common = lred & rred
        if not common:
            assert (0, rid) not in out
            continue
        jac = len(common) / len(lred | rred)
        if jac >= 0.1:
            n_common, got_jac = out[(0, rid)]
            assert n_common == len(common)
            assert got_jac == pytest.approx(jac)
        else:
            assert (0, rid) not in out
    # the twin pair must survive with a near-1 score
    twin = out[(0, 100)]
    assert twin[1] > 0.9

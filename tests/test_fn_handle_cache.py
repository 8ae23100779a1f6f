"""The driver-side JVM function-handle cache (round-11 optimization).

``session._install_jvm_function_handle_cache`` memoizes PySpark's
``_get_jvm_function`` lookup — two py4j reflection round trips per
``F.<name>()`` call otherwise.  These tests pin the contract: the patch
is installed and idempotent, handles are reused per (name, context),
and the functions still compute correct results through the cache.
"""

from pyspark.sql import functions as F

from qualityassurancetool_spark import session as session_mod


def test_patch_installed_and_idempotent():
    from pyspark.sql.functions import builtin as _builtin

    fn = _builtin._get_jvm_function
    assert getattr(fn, "_qat_handle_cache", False)
    # calling the installer again must not re-wrap the wrapper
    session_mod._install_jvm_function_handle_cache()
    assert _builtin._get_jvm_function is fn


def test_handle_reused_and_results_correct(spark):
    from pyspark.sql.functions import builtin as _builtin

    sc = spark.sparkContext
    h1 = _builtin._get_jvm_function("upper", sc)
    h2 = _builtin._get_jvm_function("upper", sc)
    assert h1 is h2  # cache hit returns the same JavaMember
    row = (
        spark.range(1)
        .select(
            F.upper(F.lit("abc")).alias("u"),
            F.sqrt(F.lit(16.0)).alias("s"),
            F.concat_ws("-", F.lit("a"), F.lit("b")).alias("c"),
        )
        .first()
    )
    assert (row["u"], row["s"], row["c"]) == ("ABC", 4.0, "a-b")


def test_stale_context_entry_refreshed(spark):
    """An entry recorded against a different context object must be
    re-fetched, not served stale (the session-restart contract)."""
    from pyspark.sql.functions import builtin as _builtin

    sc = spark.sparkContext
    fresh = _builtin._get_jvm_function("lower", sc)

    class _NotTheContext:
        _jvm = sc._jvm

    # poison the cache with a wrong-context sentinel, then look up with
    # the real context: identity check must miss and refresh the entry
    cache_holder = _builtin._get_jvm_function.__closure__
    # locate the cache dict in the wrapper's closure
    cache = next(
        c.cell_contents
        for c in cache_holder
        if isinstance(c.cell_contents, dict)
    )
    cache["lower"] = (_NotTheContext(), "stale-sentinel")
    again = _builtin._get_jvm_function("lower", sc)
    assert again is not None and again != "stale-sentinel"
    assert cache["lower"][0] is sc
    assert _builtin._get_jvm_function("lower", sc) is again
    assert fresh is not None


# ---------------------------------------------------------------- seq fastpath


def test_seq_fastpath_installed_idempotent_and_rebound():
    from pyspark.sql.classic import column as ccol
    from pyspark.sql.classic import dataframe as cdf

    assert getattr(ccol._to_seq, "_qat_fast", False)
    assert getattr(ccol._create_column_from_name, "_qat_fast", False)
    assert getattr(ccol._create_column_from_literal, "_qat_fast", False)
    # classic.dataframe imported _to_seq by value pre-patch; the install
    # loop must have rebound it, or every df.select would use the slow path
    assert cdf._to_seq is ccol._to_seq
    fn = ccol._to_seq
    session_mod._install_py4j_seq_fastpath()  # re-install is a no-op
    assert ccol._to_seq is fn


def test_seq_fastpath_chunking_equivalence(spark):
    """1, 10 (one List.of), 11 and 25 (chunked addAll) column lists all
    produce correct results through the fast path."""
    df = spark.range(3)
    for n in (1, 10, 11, 25):
        cols = [(F.col("id") + i).alias(f"c{i}") for i in range(n)]
        rows = df.select(*cols).orderBy("c0").collect()
        assert len(rows[0]) == n
        assert [r[f"c{n-1}"] for r in rows] == [n - 1, n, n + 1]


def test_seq_fastpath_none_and_empty_fallback(spark):
    """Empty lists and None-bearing lists fall back to the stock
    converter (java.util.List.of rejects nulls)."""
    from pyspark.sql.classic import column as ccol

    sc = spark.sparkContext
    empty = ccol._to_seq(sc, [])
    assert empty.size() == 0
    with_none = ccol._to_seq(
        sc, ["a", None, "b"], converter=lambda s: s
    )
    assert with_none.size() == 3
    assert with_none.apply(1) is None


def test_seq_fastpath_col_and_literal_paths(spark):
    """F.col-by-name and Python-literal wrapping go through the cached
    JVM handles and still build correct expressions."""
    row = (
        spark.range(1)
        .withColumnRenamed("id", "x")
        .select(
            (F.col("x") + 41).alias("a"),
            F.lit("s").alias("b"),
            F.lit(2.5).alias("c"),
            F.lit(True).alias("d"),
            F.lit(None).cast("int").alias("e"),
        )
        .first()
    )
    assert (row["a"], row["b"], row["c"], row["d"], row["e"]) == (
        41,
        "s",
        2.5,
        True,
        None,
    )


def test_seq_fastpath_stale_context_refreshed(spark):
    """Handles recorded against a dead context are re-fetched when the
    active SparkContext changes identity (session-restart contract)."""
    from pyspark.sql.classic import column as ccol

    sc = spark.sparkContext
    # prime the handle state, then poison its context key
    ccol._to_seq(sc, [F.lit(1)._jc], converter=lambda c: c)
    # the state dict lives in the closure of the _handles helper, which
    # is itself a closure cell of the fast _to_seq
    handles_fn = next(
        c.cell_contents
        for c in ccol._to_seq.__closure__
        if callable(c.cell_contents)
        and getattr(c.cell_contents, "__name__", "") == "_handles"
    )
    state = next(
        c.cell_contents
        for c in handles_fn.__closure__
        if isinstance(c.cell_contents, dict)
    )
    assert state.get("sc") is sc
    state["sc"] = object()  # not the live context
    out = ccol._to_seq(sc, [F.lit(7)._jc], converter=lambda c: c)
    assert out.size() == 1
    assert state["sc"] is sc  # refreshed against the live context

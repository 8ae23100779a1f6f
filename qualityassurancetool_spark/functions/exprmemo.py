"""Memoized Column expression trees (driver-side build cost only).

A ``Column`` wraps an immutable JVM expression; the same object can be
attached to any number of plans within one SparkContext (that is
ordinary PySpark usage: ``c = F.col("x") + 1; df1.select(c);
df2.select(c)``).  Builders that unroll large parameter-determined
trees — the EWMA lag sums, LSH hyperplane folds, centroid argmin
folds — pay hundreds of blocking py4j round trips per construction;
memoizing the finished Column per (parameters, SparkContext) makes
repeated query builds reuse the JVM tree instead of re-shipping it
call by call.

Nothing but UNRESOLVED expression handles is cached — no data, no
plan, no result (the same discipline as functions/literals' JSON
literal memo).  Entries are keyed to the live SparkContext identity,
so a stopped-and-recreated session rebuilds on first use.
"""

from __future__ import annotations

from typing import Callable, TypeVar

T = TypeVar("T")

_MEMO: dict = {}


def column_key(col) -> str:
    """By-value memo key for a ``Column`` argument.

    ``str(col)`` (``Column.__repr__``) pretty-prints the expression
    WITHOUT expression IDs, so two DataFrame-bound columns
    (``df1["embedding"]`` vs ``df2["embedding"]``) render identically
    while wrapping different resolved attributes — a memo keyed on it
    would hand the second caller a tree embedding the first frame's
    attribute (round-11 advisor finding).  The underlying Catalyst
    expression's ``toString`` RETAINS exprIds (``embedding#123``), so
    bound columns from different frames key apart while unresolved
    ``F.col(...)`` callers still share one entry.  ``normalized()``
    strips the per-construction Origin stack trace that would
    otherwise make every key unique."""
    return col._jc.node().normalized().toString()


def memoized_expr(key: tuple, builder: Callable[[], T]) -> T:
    """Return ``builder()`` memoized per (``key``, active SparkContext).

    ``key`` must capture EVERY input that shapes the built expression
    (column names, window order/partition keys, numeric parameters,
    literal contents) — by VALUE, never by ``id()`` (a freed object's
    id can be reused and would serve a stale tree).  ``builder`` may
    return a Column or a tuple of Columns."""
    from pyspark.core.context import SparkContext

    sc = SparkContext._active_spark_context
    ent = _MEMO.get(key)
    if ent is not None and ent[0] is sc:
        return ent[1]
    val = builder()
    if len(_MEMO) > 512:
        _MEMO.clear()
    _MEMO[key] = (sc, val)
    return val

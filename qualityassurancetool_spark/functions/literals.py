"""Fast construction of large array literals.

``F.lit(nested_python_list)`` converts element-by-element over py4j:
~4 s of driver time for a 100x64 double matrix, paid at every plan build.
``F.array(*[F.lit(x) ...])`` is as slow AND leaves an N-node expression
tree that bloats analysis and codegen.  Shipping the values as ONE JSON
string literal through ``from_json`` is a single py4j call and a single
expression node; Catalyst constant-folds the parse once per optimization,
so executors only ever see the materialized ArrayData.

JSON round-trips Python floats exactly (``json.dumps`` emits
shortest-roundtrip reprs; Jackson parses to the same IEEE double), so
values are bit-identical to the ``F.lit`` form.

Columns are memoized per value content: the JVM expression is reusable
across DataFrames of the same JVM, and repeated query builds (e.g. a
bench loop, or the two centroid-assignment sites inside one IVF query)
pay the build cost once.
"""

from __future__ import annotations

import json
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F


@lru_cache(maxsize=64)
def _cached_json_array(payload: str, ddl_type: str) -> Column:
    return F.from_json(F.lit(payload), ddl_type)


def double_matrix_literal(rows: tuple[tuple[float, ...], ...]) -> Column:
    """array<array<double>> literal from a tuple-of-tuples (hashable for
    memoization)."""
    return _cached_json_array(
        json.dumps([list(r) for r in rows]), "array<array<double>>"
    )


def double_array_literal(vals: tuple[float, ...]) -> Column:
    return _cached_json_array(json.dumps(list(vals)), "array<double>")


def long_array_literal(vals: tuple[int, ...]) -> Column:
    return _cached_json_array(json.dumps(list(vals)), "array<bigint>")

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
    # FAILFAST: createDataFrame (which these literals replaced) raised
    # loudly on type-mismatched rows; PERMISSIVE from_json would null
    # the field instead and a malformed dim would flow on as silently
    # empty/NULL-filled
    return F.from_json(F.lit(payload), ddl_type, {"mode": "FAILFAST"})


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


def literal_rows_df(spark, rows: list[tuple], row_ddl: str):
    """Small driver-built dim as a LITERAL relation: ``range(1)`` +
    ``from_json`` + ``explode`` instead of ``spark.createDataFrame``.

    ``createDataFrame`` plans as ``Scan ExistingRDD`` — a Python→JVM RDD
    round-trip that defeats pushdown/broadcast planning and shows up in
    the plan audit; a JSON literal constant-folds to a LocalRelation-style
    generate, one py4j call, one expression node.  Use for cells-sized
    dims only (centroids, probe tables, grids — tens to hundreds of rows).

    ``row_ddl`` is the struct body (e.g. ``"cent_id int, cent_vec
    array<double>"``); ``rows`` are positional tuples matching it.
    """
    names = [f.split()[0] for f in _split_ddl_fields(row_ddl)]
    # cells bound: a literal's cost is paid at plan ANALYSIS — a
    # 10k-query ADC probe table would be a ~100 MB single expression
    # that poisons plan compile (the bm25 giant-literal lesson).  Past
    # the bound, fall back to createDataFrame: a Scan ExistingRDD is
    # the RIGHT plan for a genuinely data-sized dim.
    def _weight(v) -> int:
        # a "cell" is ~8 bytes of payload: scalars count 1, but strings
        # count by length so a few-row frame of giant strings (the bm25
        # giant-literal lesson) can't sneak under the cell count and
        # still build a plan-analysis-poisoning literal
        if isinstance(v, (list, tuple)):
            return sum(_weight(x) for x in v)
        if isinstance(v, (str, bytes)):
            return max(1, len(v) // 8)
        return 1

    n_cells = sum(_weight(v) for r in rows for v in r)
    if n_cells > 200_000:
        return spark.createDataFrame(rows, row_ddl)
    payload = json.dumps([dict(zip(names, r)) for r in rows])
    col = F.from_json(
        F.lit(payload), f"array<struct<{row_ddl}>>", {"mode": "FAILFAST"}
    )
    return (
        spark.range(1)
        .select(F.explode(col).alias("_r"))
        .select(*[F.col(f"_r.{n}").alias(n) for n in names])
    )


def _split_ddl_fields(row_ddl: str) -> list[str]:
    """Split a struct-body DDL on top-level commas (commas inside
    ``array<...>``/``struct<...>`` don't split)."""
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(row_ddl):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(row_ddl[start:i].strip())
            start = i + 1
    fields.append(row_ddl[start:].strip())
    return [f for f in fields if f]

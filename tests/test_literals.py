"""functions/literals — the fast-literal dim builders and their
plan-poisoning guard rails."""

from __future__ import annotations

from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.literals import (
    double_array_literal,
    double_matrix_literal,
    literal_rows_df,
)


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_literal_rows_df_roundtrip(spark):
    rows = [(1, [1.0, 2.0], "a"), (2, [3.5, -0.25], "b'c")]
    df = literal_rows_df(
        spark, rows, "cid int, vec array<double>, label string"
    )
    got = sorted(
        (r["cid"], tuple(r["vec"]), r["label"]) for r in df.collect()
    )
    assert got == [(1, (1.0, 2.0), "a"), (2, (3.5, -0.25), "b'c")]
    # the literal path: a from_json over one range(1) row, no RDD scan
    assert "LogicalRDD" not in _analyzed(df)


def test_matrix_and_array_literals_roundtrip(spark):
    m = double_matrix_literal(((1.0, 2.0), (3.0, 4.0)))
    a = double_array_literal((0.5, -1.5))
    row = spark.range(1).select(
        F.element_at(F.element_at(m, 2), 1).alias("m21"),
        F.element_at(a, 2).alias("a2"),
    ).first()
    assert row["m21"] == 3.0 and row["a2"] == -1.5


def test_cell_bound_falls_back_to_createdataframe(spark):
    # > 200k scalar cells: the literal would poison plan analysis, so the
    # builder must hand back a genuine createDataFrame relation
    rows = [(i, list(range(64))) for i in range(4000)]  # 4000*65 = 260k
    df = literal_rows_df(spark, rows, "cid int, vec array<bigint>")
    assert "LogicalRDD" in _analyzed(df)
    assert df.count() == 4000


def test_string_payload_weighs_by_length(spark):
    # few rows, giant strings: 100 rows x 20k chars = ~250k weighted
    # cells — under the OLD scalar-counting rule this was 200 "cells"
    # and built a 2 MB literal; it must now take the RDD fallback
    rows = [(i, "x" * 20_000) for i in range(100)]
    df = literal_rows_df(spark, rows, "cid int, body string")
    assert "LogicalRDD" in _analyzed(df)
    assert df.count() == 100
    # short strings still go the literal route
    small = literal_rows_df(
        spark, [(1, "abc"), (2, "def")], "cid int, body string"
    )
    assert "LogicalRDD" not in _analyzed(small)

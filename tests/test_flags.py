"""Flag-algebra unit tests (severity-rank merge — reference
tests/test_qc.py:179-260 behavioral model)."""

import pyspark.sql.functions as F
import pytest

from qualityassurancetool_spark.flags import (
    FLAG_SEVERITY,
    QualityFlags,
    flag_from_bool,
    flag_merge,
    flag_merge_sql,
    flag_overwrite,
)


def _merge_two(spark, a, b):
    df = spark.createDataFrame(
        [(a, b)], "a tinyint, b tinyint"
    ).select(flag_merge(F.col("a"), F.col("b")).alias("m"))
    return df.collect()[0]["m"]


def test_bad_beats_everything(spark):
    for other in QualityFlags:
        assert _merge_two(spark, int(QualityFlags.BAD), int(other)) == 4


def test_missing_does_not_outrank_bad(spark):
    assert _merge_two(spark, int(QualityFlags.MISSING), int(QualityFlags.BAD)) == 4


def test_probably_bad_beats_good_and_missing(spark):
    assert _merge_two(spark, 3, 1) == 3
    assert _merge_two(spark, 3, 9) == 3


def test_null_treated_as_no_qc(spark):
    assert _merge_two(spark, None, 2) == 2
    assert _merge_two(spark, None, None) == 0


def test_merge_is_max_over_rank_property(spark):
    codes = [int(c) for c in QualityFlags]
    rows = [(a, b) for a in codes for b in codes]
    df = spark.createDataFrame(rows, "a tinyint, b tinyint").select(
        "a", "b", flag_merge(F.col("a"), F.col("b")).alias("m")
    )
    for r in df.collect():
        expect = r["a"] if FLAG_SEVERITY[r["a"]] >= FLAG_SEVERITY[r["b"]] else r["b"]
        assert r["m"] == expect, (r["a"], r["b"])


def test_flag_from_bool_nan_handling(spark):
    df = spark.createDataFrame(
        [(True,), (False,), (None,)], "b boolean"
    ).select(
        flag_from_bool(
            F.col("b"), QualityFlags.BAD, QualityFlags.GOOD, QualityFlags.MISSING
        ).alias("f")
    )
    assert [r["f"] for r in df.collect()] == [4, 1, 9]


def test_flag_overwrite(spark):
    df = spark.createDataFrame([(1, 4), (1, None)], "old tinyint, new tinyint")
    out = df.select(flag_overwrite("old", "new").alias("f")).collect()
    assert [r["f"] for r in out] == [4, 1]


def test_flag_merge_sql_matches_spark(spark):
    import duckdb

    codes = [int(c) for c in QualityFlags]
    rows = [(a, b) for a in codes for b in codes]
    spark_out = (
        spark.createDataFrame(rows, "a tinyint, b tinyint")
        .select("a", "b", flag_merge(F.col("a"), F.col("b")).alias("m"))
        .orderBy("a", "b")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a TINYINT, b TINYINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql_out = con.execute(
        f"SELECT a, b, {flag_merge_sql('a', 'b')} AS m FROM t ORDER BY a, b"
    ).fetchall()
    assert [(r["a"], r["b"], r["m"]) for r in spark_out] == sql_out

"""Scale infrastructure: bucketed co-located joins (no shuffle in the
plan) and skew-salting equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)
from qualityassurancetool_spark.sources.bucketing import (
    is_shuffle_free_join,
    write_bucketed,
)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path}/wh'")
    spark.sql("USE bktest")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "okey"),
            "bktest.orders_b",
            ["okey"],
            num_buckets=8,
        )
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "okey"),
            "bktest.lineitem_b",
            ["okey"],
            num_buckets=8,
        )
        assert is_shuffle_free_join(
            spark, "bktest.orders_b", "bktest.lineitem_b", ["okey"]
        )
        # and the join is still correct
        n_bucketed = (
            spark.table("bktest.orders_b")
            .join(spark.table("bktest.lineitem_b"), "okey")
            .count()
        )
        n_plain = orders.join(
            li, orders["o_orderkey"] == li["l_orderkey"]
        ).count()
        assert n_bucketed == n_plain
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")
        spark.sql("USE default")


def _skewed(spark):
    # 10k rows, 90% on one hot key
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise((F.col("id") % 100).cast("long"))
        .alias("k"),
        F.col("id"),
        (F.col("id") % 7).alias("v"),
    )


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    plain = big.join(small, ["k"]).select("k", "id", "dim")
    salted = salted_join(big, small, on=["k"], salt_from=["id"]).select(
        "k", "id", "dim"
    )
    assert salted.count() == plain.count()
    assert (
        salted.exceptAll(plain).count() == 0
        and plain.exceptAll(salted).count() == 0
    )


def test_salted_distinct_count_equals_countdistinct(spark):
    df = _skewed(spark)
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_distinct_count(df, ["k"], "v").collect()
    }
    assert got == want


def test_compute_behind_barrier_blocks_predicate_substitution(spark):
    """A filter on a barrier-computed column must not get its defining
    expression inlined and pushed below a repartition: the expensive
    producer (regexp_replace here) appears exactly once in the optimized
    plan, and values are unchanged."""
    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
    )

    df = spark.createDataFrame(
        [(i, f"word{i} " * (i % 5 + 1)) for i in range(100)],
        "id long, text string",
    )
    expensive = F.length(F.regexp_replace(F.col("text"), r"\s+", " "))
    naive = (
        df.repartition(8)
        .select("id", expensive.alias("n"))
        .where(F.col("n") > 10)
    )
    barriered = (
        compute_behind_barrier(df.repartition(8), {"n": expensive})
        .where(F.col("n") > 10)
        .select("id", "n")
    )
    naive_plan = naive._jdf.queryExecution().optimizedPlan().toString()
    barrier_plan = barriered._jdf.queryExecution().optimizedPlan().toString()
    # without the barrier the producer is substituted into the filter too
    assert naive_plan.count("regexp_replace") == 2
    assert barrier_plan.count("regexp_replace") == 1
    assert "Generate" in barrier_plan
    got = {(r["id"], r["n"]) for r in barriered.collect()}
    want = {(r["id"], r["n"]) for r in naive.collect()}
    assert got == want and len(got) > 0

"""Bucketed tables: shuffle-free co-located joins for big x big.

The reference never joins two large facts (SURVEY §2.3 — J1/J2 are
fact x small-config), but at 100 TB the engine's own surfaces do: flags
write-back joined to observations, dependent-quantity checks across two
high-rate streams, dedup candidate verification.  Bucketing both sides by
the join key at write time removes the per-query shuffle entirely: Spark
reads matching buckets pairwise (SortMergeJoin with no Exchange).

This is a *write-time* contract, so it lives with the sources/sinks: land
the table once with ``write_bucketed``, join it many times for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Land ``df`` as a bucketed (and optionally sorted) managed table.

    ``num_buckets`` should be sized so one bucket of the *larger* table
    fits an executor's memory at target scale (100 TB / buckets ~ task
    input); both join sides must use the same count for co-location.
    Sorting within buckets additionally removes the per-query sort of a
    SortMergeJoin.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def is_shuffle_free_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> bool:
    """True when joining the two bucketed tables on ``on`` produces a plan
    with no shuffle exchange — the co-location proof used by tests/ops."""
    df = spark.table(left_table).join(spark.table(right_table), on)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan

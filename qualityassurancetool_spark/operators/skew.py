"""Skew mitigation: salting for hot keys.

AQE (on in session.py) already splits skewed SortMergeJoin partitions at
runtime; these helpers cover the cases AQE cannot touch:

- big x small joins where the big side has a hot key and the small side is
  just over the broadcast threshold (``salted_join``: replicate the small
  side over a salt domain, split the hot key's rows across tasks);
- high-cardinality distinct aggregation under a hot group
  (``salted_distinct_count``: two-phase (key, value)->key reduction so the
  hot group's distinct set is built across many tasks, not one).

Salts derive from ``xxhash64`` of stable row columns — never ``rand()``,
which breaks task-retry determinism (a re-executed task would re-salt
differently and double-count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's rows spread over ``n_salts`` shards.

    ``salt_from`` are big-side columns whose hash picks the shard (use a
    unique/id column for uniform spread).  The small side replicates
    ``n_salts`` x (bounded: keep it well under the broadcast threshold x
    salt count).  Result equals ``big.join(small, on, how)`` exactly.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt.cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return big_s.join(small_s, on + ["_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """``countDistinct`` that survives a hot group: phase 1 reduces
    (group, value) pairs (partial agg spreads the hot group across all
    map tasks), phase 2 counts per group.  Same result as
    ``groupBy(group).agg(countDistinct(value))``."""
    return (
        df.select(*group_cols, value_col)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias(out_col))
    )


def key_skew_report(df: "DataFrame", key_col: str) -> "DataFrame":
    """One-row shuffle-health diagnostic for a prospective join/groupBy
    key: ``(n_rows, n_keys, max_count, avg_count, p50_count, p99_count,
    skew_ratio)`` where ``skew_ratio = max/avg`` — the straggler factor
    a shuffle on this key would suffer (ratio ≫ 1 ⇒ reach for
    :func:`salted_join` / AQE skew handling).  Null keys are excluded
    (they hash to one partition — a skew all of their own; count them
    separately).

    Cost: one partial-agged count shuffle + one exact-percentile agg
    over the (small) per-key counts table.  Exact percentiles keep the
    report cross-engine checkable (``x_skew_report``); at extreme key
    cardinality substitute percentile_approx — same plan shape.
    """
    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return counts.agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_c").alias("max_count"),
        (F.sum("_c") / F.count(F.lit(1))).alias("avg_count"),
        F.percentile(F.col("_c"), F.lit(0.5)).alias("p50_count"),
        F.percentile(F.col("_c"), F.lit(0.99)).alias("p99_count"),
        (
            F.max("_c") / (F.sum("_c") / F.count(F.lit(1)))
        ).alias("skew_ratio"),
    )

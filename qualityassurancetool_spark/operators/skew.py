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

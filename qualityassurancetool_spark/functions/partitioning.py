"""Partitioning guards.

A small parquet table arrives as ONE input split (files < maxPartitionBytes
and single row-group files can't split), so any operator doing heavy
per-row work right after the scan runs on one core no matter how many the
cluster has.  At 100 TB inputs arrive in thousands of splits and these
guards are no-ops — they only widen, never shrink, so they are safe to
leave in the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only if the DataFrame currently has fewer partitions
    than the cluster has cores (explicit count — AQE would coalesce a
    byte-small shuffle back to one partition and defeat the point)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def compute_behind_barrier(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """Compute ``cols`` exactly once, behind a Generate, and return ``df``
    with them appended as plain attributes.

    Catalyst's ``PushDownPredicates`` substitutes a predicate's referenced
    aliases through every intervening Project — a filter on a derived
    column (e.g. a quality score over normalized text) gets its ENTIRE
    defining expression tree inlined and pushed below any
    ``repartition()``, where it runs on the raw (often single-split) scan
    partitioning and re-evaluates shared subexpressions once per
    reference.  A Generate (here: ``explode`` of a one-element array of a
    struct) is a substitution barrier — predicates and projections that
    reference its output cannot be rewritten past it, so every expression
    in ``cols`` is evaluated exactly once per row, exactly where the
    barrier sits in the plan (i.e. AFTER any repartition below it).

    Same trick as the IVF cluster assignment
    (operators/similarity.py: ``posexplode`` Generate); this is the
    column-generic version."""
    packed = F.explode(
        F.array(F.struct(*[c.alias(k) for k, c in cols.items()]))
    )
    tmp = df.select("*", packed.alias("_barrier"))
    return tmp.select(
        "*", *[F.col("_barrier")[k].alias(k) for k in cols]
    ).drop("_barrier")


def broadcast_join_nullsafe(
    df: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
    prefix: str = "__bjn_",
    extra_keys: list[tuple[Column, str]] | None = None,
) -> DataFrame:
    """LEFT-broadcast-join a small dimension frame onto ``df`` with
    NULL-SAFE key equality — the shared "NULL key is its own stratum"
    discipline (target_encode's prior, quantile_bin's cut frame, the
    control charts' baselines/carries): a plain equi-join silently
    drops or un-enriches every NULL-keyed row.

    ``dim``'s key columns are renamed ``{prefix}{key}`` for the join
    and dropped afterwards; its non-key columns land on ``df``
    unchanged (callers pick collision-free names).  ``extra_keys``
    adds (df-side Column expression, dim column name) pairs for keys
    that are computed on the fact side (e.g. a derived bucket/cell).
    """
    from pyspark.sql import functions as F

    renamed = dim
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"{prefix}{k}")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"{prefix}{k}"))
    drop = [f"{prefix}{k}" for k in keys]
    for expr, dim_col in extra_keys or []:
        renamed = renamed.withColumnRenamed(
            dim_col, f"{prefix}{dim_col}"
        )
        cond = cond & expr.eqNullSafe(F.col(f"{prefix}{dim_col}"))
        drop.append(f"{prefix}{dim_col}")
    return df.join(F.broadcast(renamed), on=cond, how=how).drop(*drop)

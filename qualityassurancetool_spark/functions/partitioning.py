"""Partitioning guards.

A small parquet table arrives as ONE input split (files < maxPartitionBytes
and single row-group files can't split), so any operator doing heavy
per-row work right after the scan runs on one core no matter how many the
cluster has.  At 100 TB inputs arrive in thousands of splits and these
guards are no-ops — they only widen, never shrink, so they are safe to
leave in the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only if the DataFrame currently has fewer partitions
    than the cluster has cores (explicit count — AQE would coalesce a
    byte-small shuffle back to one partition and defeat the point)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

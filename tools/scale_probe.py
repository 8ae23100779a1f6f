"""Scale probe: synthesize a 10M-row observations table (events sf0.1
replicated with jittered ids/timestamps) and time the two physical
strategies for the rolling z-score:

  1. Window.partitionBy(stream).rangeBetween — parallelism = n_streams (5)
  2. bucketed-overlap halo groups — parallelism = streams x time-buckets

Evidences the SCALE.md claim that the bucketed path wins when
streams << cores.  Usage: python tools/scale_probe.py [n_replicas]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.partitioned_windows import (
    calc_zscore_bucketed,
)
from qualityassurancetool_spark.operators.zscore import calc_zscore
from qualityassurancetool_spark.schema import events_as_observations
from qualityassurancetool_spark.session import get_spark


def main() -> None:
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    only = sys.argv[2] if len(sys.argv) > 2 else None  # "window"|"bucketed"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    obs = events_as_observations(spark, "/root/testdata/sf0.1").select(
        "iot_id", "observation_type", "phenomenon_time", "result"
    )
    big = (
        obs.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(n_rep - 1))))
        .select(
            (F.col("iot_id") * n_rep + F.col("_r")).alias("iot_id"),
            "observation_type",
            F.timestamp_micros(
                F.unix_micros("phenomenon_time") + F.col("_r") * 37_000_000
            ).alias("phenomenon_time"),
            (F.col("result") + F.col("_r") % 7).alias("result"),
        )
        .repartition(64)
        .persist()
    )
    n = big.count()
    print(f"rows: {n:,}")

    strategies = [
        (
            "window partitionBy(stream)",
            lambda: calc_zscore(
                big, group_col="observation_type", rolling_time_window="60min"
            ),
        ),
        (
            "bucketed-overlap halo (JVM window)",
            lambda: calc_zscore_bucketed(
                big, group_col="observation_type", rolling_time_window="60min"
            ),
        ),
        (
            "bucketed-overlap halo (pandas kernel)",
            lambda: calc_zscore_bucketed(
                big,
                group_col="observation_type",
                rolling_time_window="60min",
                strategy="pandas",
            ),
        ),
    ]
    for label, fn in strategies:
        if only and only not in label:
            continue
        t0 = time.perf_counter()
        out = fn()
        got = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("zscore"), 3).alias("zsum"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.1f}s  rows={got['n']:,} zscore_sum={got['zsum']}")
    spark.stop()


if __name__ == "__main__":
    main()

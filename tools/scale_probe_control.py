"""Control-chart family metering (round 6): EWMA and CUSUM at 1 M and
10 M rows × 5 streams, UI-metered.

Expected shapes — both charts are ONE hash exchange on the stream key:

- EWMA: the unrolled K-lag weighted sum + preceding-window σ ride a
  single per-stream sort; shuffle bytes = the slim (stream, ts, value)
  frame, linear in rows.
- CUSUM: prefix sum then running min over it — two stacked window
  expressions over the SAME partitioning (Catalyst reuses the exchange
  and sort), plus the per-stream baseline aggregate (a 5-row broadcast).

The flag column is CONSUMED (filtered) so column pruning cannot fake a
free window (the target_encode metering gotcha).

Usage: python tools/scale_probe_control.py [n1 n2]
(defaults 1_000_000 10_000_000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

from qualityassurancetool_spark.operators.cusum import (  # noqa: E402
    cusum_anomaly,
    cusum_anomaly_bucketed,
)
from qualityassurancetool_spark.operators.episodes import (  # noqa: E402
    flag_episodes,
)
from qualityassurancetool_spark.operators.ewma import (  # noqa: E402
    ewma_anomaly,
    ewma_anomaly_bucketed,
)
from qualityassurancetool_spark.operators.seasonal import (  # noqa: E402
    seasonal_zscore,
)
from qualityassurancetool_spark.session import get_spark  # noqa: E402


def build(spark, n):
    # 5 streams, gaussian-ish noise + a planted level shift in stream 0
    # after 60% of the stream (CUSUM's target), ~1% NULL holes
    return spark.range(n).select(
        (F.col("id") % 5).cast("string").alias("stream"),
        F.col("id").alias("t"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        F.when(
            (F.col("id") * 2654435761 % 97) != 0,
            F.sin(F.col("id") * 0.7) * 2.0
            + (F.col("id") * 40503 % 1000) / 250.0
            + F.when(
                (F.col("id") % 5 == 0) & (F.col("id") > n * 0.6),
                F.lit(1.5),
            ).otherwise(F.lit(0.0)),
        ).alias("v"),
    )


def main() -> None:
    from dress_rehearsal import ui_totals

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("control-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("| op | rows | wall s | shufW MB | spill MB | flagged |")
    print("|---|---|---|---|---|---|")
    for n in sizes:
        path = f"/tmp/probe_control_{n}"
        build(spark, n).write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        # 5 streams x 1-second cadence: "4h" buckets ~ 14.4k rows each
        for label, fn in (
            (
                "ewma (window=16)",
                lambda df=df: ewma_anomaly(
                    df, "v", ["ts", "t"], ["stream"], window=16
                ).where(F.col("ewma_flag")),
            ),
            (
                "ewma BUCKETED",
                lambda df=df: ewma_anomaly_bucketed(
                    df, "v", "ts", ["stream"], window=16,
                    bucket="4h", order_extra=["t"],
                ).where(F.col("ewma_flag")),
            ),
            (
                "cusum (k=0.5, h=5)",
                lambda df=df: cusum_anomaly(
                    df, "v", ["ts", "t"], ["stream"]
                ).where(F.col("cusum_flag")),
            ),
            (
                "cusum BUCKETED",
                lambda df=df: cusum_anomaly_bucketed(
                    df, "v", "ts", ["stream"],
                    bucket="4h", order_extra=["t"],
                ).where(F.col("cusum_flag")),
            ),
            (
                "seasonal (hour_of_day, loo)",
                lambda df=df: seasonal_zscore(
                    df, "v", "ts", ["stream"], nsigma=4.0, loo=True
                ).where(F.col("seasonal_flag")),
            ),
            (
                "episodes (of cusum flags)",
                lambda df=df: flag_episodes(
                    cusum_anomaly(df, "v", ["ts", "t"], ["stream"]),
                    "cusum_flag", "ts", ["stream"],
                    max_gap="1h", value_col="v",
                ),
            ),
        ):
            before = ui_totals(spark)
            t0 = time.perf_counter()
            cnt = fn().count()
            dt = time.perf_counter() - t0
            d = {k: v - before[k] for k, v in ui_totals(spark).items()}
            print(
                f"| {label} | {n:,} | {dt:.1f} |"
                f" {d['shuffle_write'] / 1e6:.2f} |"
                f" {(d['spill_mem'] + d['spill_disk']) / 1e6:.0f} |"
                f" {cnt:,} |",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()

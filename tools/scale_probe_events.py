"""Event-analytics scale probe: funnel / cohort / transitions /
co-occurrence metered at 1M and 10M synthetic events, plus the
co-occurrence hub-cap pathology arm.

Claims under test (docs/SCALE.md):
 - funnel's shuffle is proportional to STEP-TYPE rows only (the type
   filter reaches the scan; non-step traffic never moves);
 - cohort/transitions shuffle linearly in events but their outputs
   stay cells-sized;
 - co-occurrence without a cap is quadratic in the hottest basket
   (one bot user with a 30 k-item basket => 450 M pairs from one
   task) while max_per_user bounds it to cap²/2 per user.

Usage: python tools/scale_probe_events.py [n_events ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402


def build_events(spark, n: int):
    """Deterministic clickstream: ~n/200 users with Zipf-ish activity,
    5 event types with funnel-shaped frequencies, 90-day span."""
    types = F.array(
        *[
            F.lit(t)
            for t in [
                "view", "view", "view", "view", "click", "click",
                "purchase", "signup", "error", "view",
            ]
        ]
    )
    users = max(1, n // 200)
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        # skew: low ids get more traffic (id*id % users clusters mass)
        (F.xxhash64("id") % users).cast("long").alias("user_id"),
        F.timestamp_micros(
            F.lit(1704067200000000)  # 2024-01-01
            + (F.xxhash64("id", F.lit(1)) % (90 * 86400)) * 1_000_000
        ).alias("ts"),
        types[(F.xxhash64("id", F.lit(2)) % 10).cast("int")].alias(
            "event_type"
        ),
    )


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "1"
    from qualityassurancetool_spark.session import get_spark
    from qualityassurancetool_spark.operators.funnel import funnel_depth
    from qualityassurancetool_spark.operators.cohort import (
        cohort_retention,
    )
    from qualityassurancetool_spark.operators.transitions import (
        event_transitions,
    )
    from qualityassurancetool_spark.operators.cooccurrence import (
        cooccurrence,
    )
    from dress_rehearsal import ui_totals

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("events-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print("| op | rows | out | wall s | shufW MB | spill MB |")
    print("|---|---|---|---|---|---|")
    for n in sizes:
        path = f"/tmp/probe_events_{n}"
        build_events(spark, n).write.mode("overwrite").parquet(path)
        ev = spark.read.parquet(path)
        ops = {
            "funnel(3-step,6h)": lambda ev=ev: funnel_depth(
                ev, ["view", "click", "purchase"], within="6h"
            ),
            "cohort(week)": lambda ev=ev: cohort_retention(ev),
            "transitions": lambda ev=ev: event_transitions(
                ev, order_extra=["event_id"]
            ),
        }
        for label, fn in ops.items():
            before = ui_totals(spark)
            t0 = time.perf_counter()
            cnt = fn().count()
            dt = time.perf_counter() - t0
            d = {
                k: v - before[k] for k, v in ui_totals(spark).items()
            }
            print(
                f"| {label} | {n:,} | {cnt:,} | {dt:.1f} "
                f"| {d['shuffle_write'] / 1e6:.1f} "
                f"| {(d['spill_mem'] + d['spill_disk']) / 1e6:.0f} |",
                flush=True,
            )

    # co-occurrence hub pathology: 200k normal users with 5-item
    # baskets + ONE bot user with a 30k-item basket
    normal = spark.range(1_000_000).select(
        (F.col("id") % 200_000 + 10).alias("user_id"),
        (F.xxhash64("id") % 50_000).alias("item_id"),
    )
    bot = spark.range(30_000).select(
        F.lit(0).cast("long").alias("user_id"),
        F.col("id").alias("item_id"),
    )
    ui = normal.unionByName(bot)
    path = "/tmp/probe_ui"
    ui.write.mode("overwrite").parquet(path)
    ui = spark.read.parquet(path)
    for label, kw in (
        ("cooccur cap=64", {"max_per_user": 64}),
        ("cooccur UNCAPPED (bot basket)", {}),
    ):
        before = ui_totals(spark)
        t0 = time.perf_counter()
        cnt = cooccurrence(ui, **kw).count()
        dt = time.perf_counter() - t0
        d = {k: v - before[k] for k, v in ui_totals(spark).items()}
        print(
            f"| {label} | 1,030,000 | {cnt:,} | {dt:.1f} "
            f"| {d['shuffle_write'] / 1e6:.1f} "
            f"| {(d['spill_mem'] + d['spill_disk']) / 1e6:.0f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

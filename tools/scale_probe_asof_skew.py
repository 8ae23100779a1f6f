"""As-of join skew stress (VERDICT r4 #5): plant a pathological key —
half of the INDEPENDENT side lands inside one tolerance bucket (a
burst / stuck-sensor shape, which with the r4 rehearsal's AQE
broadcast→shuffle flip is exactly the regime where one hash-join
partition would own 5M rows) — and meter the per-task straggler
factor (max / median task time and shuffle read of the join stage)
with AQE skew-join splitting on (the session default) vs off.

Pass criterion from the verdict: straggler factor ≤ ~2 with the
session defaults.  Output: a markdown table for docs/SCALE.md.

Usage: python tools/scale_probe_asof_skew.py [n_rows]   (default 10M)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def _task_summary(spark, stage_id: int) -> dict:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = (
        f"{ui}/api/v1/applications/{app}/stages/{stage_id}"
        "/0/taskSummary?quantiles=0.0,0.5,1.0"
    )
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def _join_stage_stats(spark, before_ids: set) -> dict:
    """Heaviest new completed stage (by shuffle read) since before_ids."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.load(r)
    new = [s for s in stages if s["stageId"] not in before_ids]
    if not new:
        return {}
    hot = max(new, key=lambda s: s.get("shuffleReadBytes", 0))
    ts = _task_summary(spark, hot["stageId"])
    rt = ts.get("executorRunTime", [0, 0, 0])
    sr = ts.get("shuffleReadMetrics", {}).get("readBytes", [0, 0, 0])
    return {
        "stage": hot["stageId"],
        "n_tasks": hot.get("numCompleteTasks"),
        "run_med_s": rt[1] / 1e3,
        "run_max_s": rt[2] / 1e3,
        "straggler": (rt[2] / rt[1]) if rt[1] else float("inf"),
        "sr_med_mb": sr[1] / 1e6,
        "sr_max_mb": sr[2] / 1e6,
    }


def _stage_ids(spark) -> set:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return {s["stageId"] for s in json.load(r)}


def main() -> None:
    import os

    os.environ["SPARK_GRAFT_UI"] = "1"
    from qualityassurancetool_spark.operators.asof import asof_nearest_join
    from qualityassurancetool_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("asof-skew")
    spark.sparkContext.setLogLevel("ERROR")
    # disable broadcast so the join is a real shuffle join — the skew
    # regime under test (AQE flips small runs to broadcast, where skew
    # is moot; the 10M rehearsal showed the flip already happened)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    base = spark.range(n)
    h = F.crc32(F.col("id").cast("string"))
    # independent side: HALF the rows burst inside one 30-s tolerance
    # bucket (epoch 1.7e9 + [0, 30s)); the rest at 10 s cadence
    burst_t = F.lit(1_700_000_000_000_000) + (h % 30_000_000)
    normal_t = F.lit(1_700_000_000_000_000) + F.col("id") * 10_000_000
    ind = base.select(
        F.col("id").alias("iot_id"),
        F.timestamp_micros(
            F.when(F.col("id") % 2 == 0, burst_t).otherwise(normal_t)
        ).alias("phenomenon_time"),
        (h % 1000 / 10.0).alias("result"),
    )
    # dependent side: normal cadence only (the burst partner search is
    # the hot hash-join key; output stays bounded)
    dep = base.where(F.col("id") % 5 == 0).select(
        (F.col("id") + 10 * n).alias("iot_id"),
        F.timestamp_micros(normal_t + 3_000_000).alias("phenomenon_time"),
    )

    # untimed warm-up: JIT/codegen/shuffle-service costs must not be
    # attributed to whichever config runs first (the r3 bench lesson)
    asof_nearest_join(
        dep.limit(50_000), ind.limit(50_000), "30s"
    ).where(F.col("ind_iot_id").isNotNull()).count()

    print("| variant | wall s | out rows | tasks | task med s "
          "| task max s | straggler | shufR med MB | shufR max MB |")
    print("|---|---|---|---|---|---|---|---|---|")
    cases = [
        ("skew-join OFF", False, None),
        ("skew-join ON (session default)", True, None),
        ("salt=8 (asof salt knob)", True, 8),
    ]
    for label, skew_on, salt in cases:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
        )
        spark.catalog.clearCache()
        before = _stage_ids(spark)
        t0 = time.perf_counter()
        out = (
            asof_nearest_join(dep, ind, "30s", salt=salt)
            .where(F.col("ind_iot_id").isNotNull())
            .count()
        )
        dt = time.perf_counter() - t0
        st = _join_stage_stats(spark, before)
        print(
            f"| {label} | {dt:.1f} | {out:,} "
            f"| {st.get('n_tasks')} | {st.get('run_med_s', 0):.1f} "
            f"| {st.get('run_max_s', 0):.1f} "
            f"| {st.get('straggler', 0):.1f} "
            f"| {st.get('sr_med_mb', 0):.1f} "
            f"| {st.get('sr_max_mb', 0):.1f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""QC-side dress rehearsal: the reference-parity operator families
(range/gradient/z-score chain, sessionization, bucketed as-of join,
stabilization windows) UI-metered at 1M and 10M observations — the
companion to ``tools/dress_rehearsal.py``'s corpus-side run, closing
the loop on the claim that the QC plans hold their shuffle shapes at
scale (the bench measures them at 100k rows; this measures 100×).

Corpus: synthetic observations shaped like the driver's events table —
150k sensors (sessions stay shard-sized), 5 observation types with the
bench thresholds, 10-second cadence with hash jitter, hash-valued
results so ~2 % of rows breach their range.  All generation is
deterministic Column arithmetic; nothing leaves /tmp/dress_qc.

Usage: python tools/dress_rehearsal_qc.py [n_rows ...]
       default: 1000000 10000000
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

ROOT = "/tmp/dress_qc"
TYPES = ["click", "purchase", "view", "signup", "error"]


def observations(spark, n_rows: int):
    base = spark.range(n_rows)
    h = F.crc32(F.col("id").cast("string"))
    ts = F.timestamp_micros(
        F.lit(1700000000_000000)
        + F.col("id") * 10_000_000  # 10 s cadence
        + (h % 1_000_000)          # sub-second jitter
    )
    return base.select(
        F.col("id").alias("iot_id"),
        (F.col("id") % 150_000).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in TYPES]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("observation_type"),
        ts.alias("phenomenon_time"),
        # values mostly inside [1, 250], ~2% planted breaches
        F.when(h % 50 == 0, 500.0 + (h % 100))
        .otherwise(1.0 + (h % 2400) / 10.0)
        .alias("result"),
        (51.0 + (h % 2000) / 10000.0).alias("lat"),
        (3.0 + ((h * 7) % 2000) / 10000.0).alias("long"),
        F.lit(0).cast("tinyint").alias("qc_flag"),
    )


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "1"
    from qualityassurancetool_spark.session import get_spark

    sys.path.insert(0, "/root/repo")
    from tools.dress_rehearsal import Meter

    from qualityassurancetool_spark.config import QCConfig
    from qualityassurancetool_spark.operators.asof import asof_nearest_join
    from qualityassurancetool_spark.operators.sessionize import (
        with_session_ids,
    )
    from qualityassurancetool_spark.operators.stabilization import (
        apply_stabilization,
    )
    from qualityassurancetool_spark.plans.qc_pipeline import run_qc_pipeline

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    os.makedirs(ROOT, exist_ok=True)
    spark = get_spark("dress-qc")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = QCConfig.from_dict(
        {
            "QC": [
                {
                    "id": t,
                    "range": {"min": 1.0, "max": 250.0},
                    "gradient": {"min": -50.0, "max": 50.0},
                    "zscore": {"min": -3.0, "max": 3.0},
                }
                for t in TYPES
            ],
            "zscore_time_window": "10min",
        }
    )
    cfg5k = QCConfig.from_dict(
        {
            "QC": [
                {
                    "id": f"s{i}",
                    "range": {"min": 1.0, "max": 250.0},
                    "gradient": {"min": -50.0, "max": 50.0},
                    "zscore": {"min": -3.0, "max": 3.0},
                }
                for i in range(5000)
            ],
            "zscore_time_window": "10min",
        }
    )
    print(
        "| stage | rows | wall s | out rows | input MB | shufW MB "
        "| shufR MB | spillM MB | spillD MB |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for n in sizes:
        path = os.path.join(ROOT, f"obs_{n}")
        m = Meter(spark)
        m.stage(
            "obs write", n,
            lambda: observations(spark, n)
            .repartition(32)
            .write.mode("overwrite")
            .parquet(path)
            or n,
        )
        obs = spark.read.parquet(path)
        # predicate on the computed flag so Catalyst cannot prune the
        # whole check chain out of a bare count()
        m.stage(
            "qc chain, 5 streams (worst-case window parallelism)", n,
            lambda: run_qc_pipeline(obs, cfg, spark)
            .where(F.col("qc_flag") >= 0)
            .count(),
        )
        # round-5 fix: window_strategy=bucketed routes BOTH window
        # stages (gradient + z-score) through the streams×buckets
        # twins — the whole-chain answer to the 5-stream wall
        cfg_bkt = QCConfig.from_dict(
            {
                "QC": [
                    {
                        "id": t,
                        "range": {"min": 1.0, "max": 250.0},
                        "gradient": {"min": -50.0, "max": 50.0},
                        "zscore": {"min": -3.0, "max": 3.0},
                    }
                    for t in TYPES
                ],
                "zscore_time_window": "10min",
                "window_strategy": "bucketed",
            }
        )
        m.stage(
            "qc chain, 5 streams, BUCKETED (window_strategy)", n,
            lambda: run_qc_pipeline(obs, cfg_bkt, spark)
            .where(F.col("qc_flag") >= 0)
            .count(),
        )
        # realistic deployment shape: thousands of datastreams — window
        # parallelism scales with stream cardinality (the reference's
        # fleet has many datastreams; 5 streams is the bench's
        # deliberately adversarial floor, for which the bucketed twins
        # in operators/partitioned_windows exist)
        obs5k = obs.withColumn(
            "stream5k",
            F.concat(F.lit("s"), (F.col("user_id") % 5000).cast("string")),
        )
        # the remedy for the 5-stream wall: the bucketed twin keys the
        # same RANGE windows by (stream, time-bucket) with halo rows,
        # so parallelism = streams x buckets instead of streams
        from qualityassurancetool_spark.operators.partitioned_windows import (
            bucketed_time_rolling,
        )

        m.stage(
            "zscore stats, 5 streams, BUCKETED twin", n,
            lambda: bucketed_time_rolling(
                obs,
                {"mu": ("result", "mean"), "sd": ("result", "std")},
                partition_cols=["observation_type"],
                before="10min",
            )
            .where(F.col("mu") >= -1e18)
            .count(),
        )
        m.stage(
            "zscore stats, 5 streams, plain window", n,
            lambda: obs.withColumn(
                "mu",
                F.avg("result").over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("observation_type")
                    .orderBy(F.unix_micros("phenomenon_time"))
                    .rangeBetween(-600_000_000, 0)
                ),
            )
            .where(F.col("mu") >= -1e18)
            .count(),
        )
        m.stage(
            "qc chain, 5000 streams", n,
            lambda: run_qc_pipeline(
                obs5k, cfg5k, spark, stream_key="stream5k"
            )
            .where(F.col("qc_flag") >= 0)
            .count(),
        )
        m.stage(
            "sessionize (150k users)", n,
            lambda: with_session_ids(
                obs, "user_id", "phenomenon_time", gap="2min",
                order_extra=["iot_id"],
            )
            .groupBy("user_id", "session_idx")
            .agg(F.count(F.lit(1)).alias("n"))
            .count(),
        )
        dep = obs.where(F.col("observation_type") == "click")
        ind = obs.where(F.col("observation_type") == "view")
        m.stage(
            "as-of join (tol 30s)", n,
            lambda: asof_nearest_join(dep, ind, "30s")
            .where(F.col("ind_iot_id").isNotNull())
            .count(),
        )
        stab_in = obs.select(
            "iot_id", "observation_type", "phenomenon_time", "result",
            F.lit(1.0).alias("qc_range_min"),
            F.lit(250.0).alias("qc_range_max"),
            F.lit(600.0).alias("max_allowed_downtime"),
            F.lit(120.0).alias("dt_stabilization"),
        )
        m.stage(
            "stabilization windows", n,
            lambda: apply_stabilization(
                stab_in, group_cols=["observation_type"]
            )
            .where(
                F.coalesce(
                    F.col("stabilization_flag").cast("int"), F.lit(0)
                )
                >= 0
            )
            .count(),
        )
        m.stage(
            "stabilization, BUCKETED twin", n,
            lambda: apply_stabilization(
                stab_in, group_cols=["observation_type"],
                strategy="bucketed",
            )
            .where(
                F.coalesce(
                    F.col("stabilization_flag").cast("int"), F.lit(0)
                )
                >= 0
            )
            .count(),
        )
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()

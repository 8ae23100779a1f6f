"""Round-9 promoted-query rehearsal: `resample_interpolate` and
`heavy_hitters_by` UI-metered at 1M and 10M rows — every driver-gate
family carries a measured decade; these two joined the gate in round 9.

Shapes:
- resample: 1,000 streams × N rows of duplicate-heavy hourly ticks,
  resampled to a 6h grid with linear interpolation — ONE window
  exchange on the stream key, output ∝ grid;
- heavy_hitters_by: N (lang, token) rows over 20 langs with a zipf-ish
  token mix — two passes (per-(partition, group) Misra–Gries candidate
  summaries, then the exact verify count), state bounded by
  groups × ⌈1/f⌉ per task regardless of token cardinality.

Usage: python tools/dress_rehearsal_promoted.py [n_rows ...]
       default: 1000000 10000000
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

ROOT = "/tmp/dress_promoted"


def ticks(spark, n: int):
    h = F.crc32(F.col("id").cast("string"))
    return spark.range(n).select(
        F.concat(F.lit("s"), F.col("id") % 1000).alias("sid"),
        # hourly cadence per stream, ~30% duplicate timestamps
        F.timestamp_micros(
            F.lit(1700000000_000000)
            + (F.col("id") / 1000).cast("long") * 3_600_000_000
            - F.when(h % 10 < 3, (F.col("id") % 3) * 3_600_000_000)
            .otherwise(F.lit(0))
        ).alias("ts"),
        ((h % 100000) / 100.0).alias("v"),
    )


def lang_tokens(spark, n: int):
    h = F.crc32(F.col("id").cast("string"))
    # zipf-ish: token rank r with frequency ~ 1/r over 10k tokens —
    # pmod(h, pmod(h2, 10000)+1) concentrates mass on low ranks
    h2 = F.crc32(F.concat(F.lit("r"), F.col("id").cast("string")))
    rank = F.pmod(h, F.pmod(h2, 10000) + 1)
    return spark.range(n).select(
        F.concat(F.lit("lang"), F.col("id") % 20).alias("lang"),
        F.concat(F.lit("tok"), rank).alias("token"),
    )


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "1"
    from qualityassurancetool_spark.operators.heavy_hitters import (
        heavy_hitters_by,
    )
    from qualityassurancetool_spark.operators.resample import (
        resample_interpolate,
    )
    from qualityassurancetool_spark.session import get_spark
    from tools.dress_rehearsal import Meter

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    os.makedirs(ROOT, exist_ok=True)
    spark = get_spark("dress-promoted")
    spark.sparkContext.setLogLevel("ERROR")
    print("| stage | rows | wall s | out rows | input MB | shufW MB "
          "| shufR MB | spillM MB | spillD MB |")
    print("|---|---|---|---|---|---|---|---|---|")
    for n in sizes:
        tpath = os.path.join(ROOT, f"ticks_{n}")
        dpath = os.path.join(ROOT, f"toks_{n}")
        m = Meter(spark)
        m.stage(
            "ticks write", n,
            lambda: ticks(spark, n).repartition(32)
            .write.mode("overwrite").parquet(tpath) or n,
        )
        t = spark.read.parquet(tpath)
        m.stage(
            "resample 6h linear", n,
            lambda: resample_interpolate(
                t, id_col="sid", ts_col="ts", value_col="v",
                freq_seconds=21600, method="linear",
            ).where(F.col("value").isNotNull()).count(),
        )
        m.stage(
            "tokens write", n,
            lambda: lang_tokens(spark, n).repartition(32)
            .write.mode("overwrite").parquet(dpath) or n,
        )
        d = spark.read.parquet(dpath)
        m.stage(
            "heavy_hitters_by f=0.001", n,
            lambda: heavy_hitters_by(d, ["lang"], "token", 0.001).count(),
        )
        # the reshaping family rides along: best-record-per-second over
        # the same ticks (min-struct hash agg — ONE shuffle, no window)
        from qualityassurancetool_spark.operators.pivot_export import (
            best_record_per_second,
        )

        m.stage(
            "best_record_per_second", n,
            lambda: best_record_per_second(
                t.withColumn("qc_flag", F.lit(0).cast("tinyint"))
                .withColumnRenamed("v", "result"),
                stream_col="sid",
                ts_col="ts",
                id_col="result",
            ).count(),
        )
    spark.stop()


if __name__ == "__main__":
    main()

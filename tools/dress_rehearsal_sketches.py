"""UI-metered dress rehearsal for the distinct-sketch family (HLL,
KMV) against the exact countDistinct baseline.

The scale claim to verify is the one that matters at 100 TB: the
sketches' shuffle is bounded by ``groups × sketch-size`` regardless of
key cardinality, while exact ``countDistinct`` shuffles every distinct
key.  Runs the same three jobs at two input sizes (default 1M / 10M
rows, ~1/8 distinct keys, 16 groups) and prints the per-stage
shuffle/spill table (same method as ``tools/dress_rehearsal.py``).

Usage: python tools/dress_rehearsal_sketches.py [n_rows [n_rows2]]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from dress_rehearsal import Meter  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from qualityassurancetool_spark.operators.hll import (  # noqa: E402
    hll_distinct_by,
)
from qualityassurancetool_spark.operators.kmv import (  # noqa: E402
    kmv_estimate_by,
    kmv_sketch_by,
)
from qualityassurancetool_spark.session import get_spark  # noqa: E402

GROUPS = 16


def keys(spark, n_rows: int):
    """n_rows rows, ~n_rows/8 distinct string keys, 16 groups —
    materialized to parquet so each metered stage pays a clean scan,
    not a re-executed round-robin exchange."""
    path = f"/tmp/dress_sketch_keys_{n_rows}"
    # md5-shaped keys: URLs/doc-ids at crawl scale are high-entropy,
    # so shuffle compression can't hide the exact path's volume the
    # way low-entropy "key:N" strings would.
    spark.range(n_rows).select(
        (F.col("id") % GROUPS).cast("string").alias("g"),
        F.md5(
            ((F.col("id") * 2654435761) % (n_rows // 8))
            .cast("string")
        ).alias("k"),
    ).repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def run(spark, n_rows: int) -> None:
    df = keys(spark, n_rows)
    meter = Meter(spark)
    print(f"\n### sketches @ {n_rows:,} rows")
    print("| stage | n_docs | wall_s | out_rows | input MB | shufW MB "
          "| shufR MB | spillM MB | spillD MB |")
    print("|---|---|---|---|---|---|---|---|---|")
    # len(collect()) — NOT .count(): count() lets Catalyst prune the
    # aggregate columns entirely (a groupBy count only needs the keys)
    # and the "exact" stage degenerates to distinct-g
    meter.stage(
        "exact countDistinct", n_rows,
        lambda: len(
            df.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
        ),
    )
    meter.stage(
        "hll p=12 grouped", n_rows,
        lambda: len(hll_distinct_by(df, ["g"], "k", p=12).collect()),
    )
    meter.stage(
        "kmv k=256 grouped", n_rows,
        lambda: len(
            kmv_estimate_by(
                kmv_sketch_by(df, ["g"], "k", k=256), ["g"], k=256
            ).collect()
        ),
    )
    from qualityassurancetool_spark.operators.ddsketch import (
        ddsketch_build,
        ddsketch_quantiles,
    )

    vals = df.withColumn(
        "v", (F.crc32(F.col("k")) % 1_000_000) / F.lit(97.0)
    )
    meter.stage(
        "exact percentiles", n_rows,
        lambda: len(
            vals.groupBy("g").agg(
                F.expr(
                    "percentile(v, array(0.25, 0.5, 0.75, 0.95))"
                ).alias("p")
            ).collect()
        ),
    )
    meter.stage(
        "ddsketch a=1% grouped", n_rows,
        lambda: len(
            ddsketch_quantiles(
                ddsketch_build(vals, "v", ["g"], alpha=0.01),
                [0.25, 0.5, 0.75, 0.95],
                ["g"],
                alpha=0.01,
            ).collect()
        ),
    )


def main() -> None:
    import os

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    os.environ["SPARK_GRAFT_UI"] = "1"  # probe READS the UI metrics API
    spark = get_spark("dress-sketches")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        run(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()

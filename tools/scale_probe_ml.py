"""ML-prep scale probe: logistic-regression training and feature
prep metered at 1M / 10M rows.

Claims under test (docs/SCALE.md):
 - each GD iteration shuffles only d+1 doubles (aggregate state),
   so shuffle bytes are ~constant in rows and linear in iterations;
 - target encoding's window pass and chi²'s contingency shuffle are
   one exchange each, linear in rows with cells-sized outputs.

Usage: python tools/scale_probe_ml.py [n_rows ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402


def build(spark, n: int):
    """Deterministic labeled rows: 3 numeric features with a known
    separating direction + noise, one 20-way categorical."""
    h = lambda k: F.xxhash64("id", F.lit(k))  # noqa: E731
    u = lambda k: (h(k) % 10_000) / 10_000.0  # noqa: E731
    x1, x2, x3 = u(1), u(2), u(3)
    margin = x1 - x2 + 0.5 * x3 - 0.25
    return spark.range(n).select(
        x1.alias("x1"),
        x2.alias("x2"),
        x3.alias("x3"),
        F.concat(F.lit("c"), (h(4) % 20).cast("string")).alias("cat"),
        # label: sign of margin with ~10% deterministic flips
        F.when(
            (h(5) % 10 == 0), (margin <= 0).cast("double")
        )
        .otherwise((margin > 0).cast("double"))
        .alias("y"),
    )


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "1"
    from qualityassurancetool_spark.session import get_spark
    from qualityassurancetool_spark.operators.logreg import (
        apply_logistic_regression,
        train_logistic_regression,
    )
    from qualityassurancetool_spark.operators.feature_prep import (
        chi_squared,
        target_encode,
    )
    from dress_rehearsal import ui_totals

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("ml-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("| op | rows | wall s | shufW MB | spill MB | note |")
    print("|---|---|---|---|---|---|")
    for n in sizes:
        path = f"/tmp/probe_ml_{n}"
        build(spark, n).write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)

        before = ui_totals(spark)
        t0 = time.perf_counter()
        m = train_logistic_regression(
            df, ["x1", "x2", "x3"], "y", iters=20
        )
        dt = time.perf_counter() - t0
        d = {k: v - before[k] for k, v in ui_totals(spark).items()}
        acc = (
            apply_logistic_regression(df, m)
            .select(
                F.avg(
                    ((F.col("score") > 0.5) == (F.col("y") > 0.5))
                    .cast("double")
                ).alias("a")
            )
            .collect()[0]["a"]
        )
        print(
            f"| logreg 20 iters | {n:,} | {dt:.1f} "
            f"| {d['shuffle_write'] / 1e6:.2f} "
            f"| {(d['spill_mem'] + d['spill_disk']) / 1e6:.0f} "
            f"| acc={acc:.3f} |",
            flush=True,
        )
        # NB: filter on the encoded column so count() cannot prune
        # the window away (a bare count of target_encode's output is
        # a no-op scan after column pruning)
        for label, fn in (
            (
                "target_encode(loo)",
                lambda df=df: target_encode(
                    df, "cat", "y", smoothing=5.0, loo=True
                ).where(F.col("cat_te").isNotNull()),
            ),
            (
                "chi2(2 features)",
                lambda df=df: chi_squared(
                    df.withColumn(
                        "b1",
                        (F.col("x1") > 0.5).cast("string"),
                    ),
                    ["cat", "b1"],
                    "y",
                ),
            ),
        ):
            before = ui_totals(spark)
            t0 = time.perf_counter()
            cnt = fn().count()
            dt = time.perf_counter() - t0
            d = {
                k: v - before[k] for k, v in ui_totals(spark).items()
            }
            print(
                f"| {label} | {n:,} | {dt:.1f} "
                f"| {d['shuffle_write'] / 1e6:.2f} "
                f"| {(d['spill_mem'] + d['spill_disk']) / 1e6:.0f} "
                f"| out={cnt:,} |",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()

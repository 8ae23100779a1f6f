"""Streaming sketch state-store metering (VERDICT r5 #8).

The bounded-state claims of the streaming sketch family (CMS =
depth×width cells, HLL ≤ 2^p registers, KMV ≤ shards×k rows, DDSketch
one counter per occupied bucket, Misra–Gries ≤ shards×capacity) are
proven by restart-parity tests; this probe turns them into MEASURED
numbers from Spark's own streaming-progress metrics: each query runs
3 micro-batches (maxFilesPerTrigger=1 over 3 appended input files) at
two input sizes, and we record per-batch ``stateOperators``
``numRowsTotal`` / ``stateMemory`` bytes.  The table belongs in
docs/SCALE.md: state rows/bytes must stay FLAT while input doubles —
the whole point of a sketch; the unbounded baseline
(``dropDuplicates``) is included as the control arm whose state grows
with every distinct key forever.

Usage: python tools/dress_rehearsal_streaming.py [n1 n2]
(defaults 200_000 400_000)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from qualityassurancetool_spark.session import get_spark  # noqa: E402


def _feed(spark, land: str, n: int, batches: int = 3) -> None:
    """``batches`` parquet files of ``n // batches`` distinct keys each
    (disjoint across batches so distinct-state controls actually
    grow), plus a skewed value column for ddsketch."""
    per = n // batches
    for b in range(batches):
        (
            spark.range(b * per, (b + 1) * per)
            .select(
                F.concat(F.lit("k"), F.col("id")).alias("k"),
                (
                    F.exp((F.col("id") % 1000) / 100.0)
                ).alias("v"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(land)
        )


def _run(spark, stream_df, ckpt: str):
    """Run 3 micro-batches (1 file each), return per-batch
    (rows_in, state_rows, state_bytes)."""
    q = (
        stream_df.writeStream.foreachBatch(lambda df, _id: df.count())
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = []
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        st = ops[0]
        mem = st.get("stateMemory")
        if mem is None:
            mem = (st.get("customMetrics") or {}).get(
                "stateOnCurrentVersionSizeBytes", 0
            )
        out.append(
            (
                p.get("numInputRows", 0),
                st.get("numRowsTotal", 0),
                int(mem or 0),
            )
        )
    return out


def _feed_chain(
    spark, land: str, n: int, streams: int = 1000, batches: int = 3
) -> None:
    """``batches`` files of per-stream ordered observations around a
    target of 10, ~1 % planted excursions — the fused incident chain's
    input shape.  Streams FIXED across batches: chain state must stay
    O(streams) while input doubles."""
    per = n // batches
    for b in range(batches):
        (
            spark.range(b * per, (b + 1) * per)
            .select(
                F.concat(F.lit("s"), F.col("id") % streams).alias("g"),
                F.timestamp_micros(
                    F.lit(1700000000_000000) + F.col("id") * 1_000_000
                ).alias("ts"),
                F.when(F.col("id") % 97 == 0, 18.0)
                .otherwise(10.0 + (F.col("id") % 7) / 10.0)
                .alias("v"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(land)
        )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 400_000]
    spark = get_spark("streaming-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from qualityassurancetool_spark.streaming.cms import streaming_cms
    from qualityassurancetool_spark.streaming.ddsketch import (
        streaming_ddsketch,
    )
    from qualityassurancetool_spark.streaming.heavy_hitters import (
        streaming_heavy_hitter_summaries,
    )
    from qualityassurancetool_spark.streaming.hll import streaming_hll
    from qualityassurancetool_spark.streaming.kmv import streaming_kmv

    OPS = [
        (
            "cms (w=2048,d=4)",
            lambda s: streaming_cms(s, "k", width=2048, depth=4),
        ),
        ("hll (p=12)", lambda s: streaming_hll(s, "k", p=12)),
        (
            "kmv (k=256,shards=8)",
            lambda s: streaming_kmv(s, "k", k=256, shards=8),
        ),
        (
            "ddsketch (alpha=0.01)",
            lambda s: streaming_ddsketch(s, "v", alpha=0.01),
        ),
        (
            "heavy_hitters (cap=256,shards=32)",
            lambda s: streaming_heavy_hitter_summaries(
                s, "k", capacity=256, n_shards=32
            ),
        ),
        (
            "dropDuplicates (UNBOUNDED control)",
            lambda s: s.dropDuplicates(["k"]),
        ),
    ]

    print(
        "| op | input rows | batch | rows in | state rows |"
        " state KB | wall s |"
    )
    print("|---|---|---|---|---|---|---|")
    for n in sizes:
        for label, build in OPS:
            work = tempfile.mkdtemp(prefix="stream_probe_")
            land, ckpt = f"{work}/land", f"{work}/ckpt"
            _feed(spark, land, n)
            stream = (
                spark.readStream.schema("k string, v double")
                .option("maxFilesPerTrigger", 1)
                .parquet(land)
            )
            t0 = time.perf_counter()
            rows = _run(spark, build(stream), ckpt)
            dt = time.perf_counter() - t0
            for i, (rin, srows, sbytes) in enumerate(rows):
                print(
                    f"| {label} | {n:,} | {i + 1} | {rin:,} |"
                    f" {srows:,} | {sbytes / 1024:.0f} |"
                    f" {dt:.1f} |" if i == len(rows) - 1 else
                    f"| {label} | {n:,} | {i + 1} | {rin:,} |"
                    f" {srows:,} | {sbytes / 1024:.0f} | |",
                    flush=True,
                )
            shutil.rmtree(work, ignore_errors=True)

    # the fused chart→episodes chain: state must stay O(streams) —
    # ONE row per stream — while input doubles (round 9)
    from qualityassurancetool_spark.streaming.incident_chain import (
        streaming_cusum_episodes,
    )

    for n in sizes:
        work = tempfile.mkdtemp(prefix="stream_probe_")
        land, ckpt = f"{work}/land", f"{work}/ckpt"
        _feed_chain(spark, land, n, streams=1000)
        stream = (
            spark.readStream.schema("g string, ts timestamp, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        t0 = time.perf_counter()
        rows = _run(
            spark,
            streaming_cusum_episodes(
                stream, "v", "ts", "g", target=10.0, sigma=1.0,
                threshold=5.0, max_gap="1h", min_rows=2,
            ),
            ckpt,
        )
        dt = time.perf_counter() - t0
        label = "cusum→episodes fused (1000 streams)"
        for i, (rin, srows, sbytes) in enumerate(rows):
            print(
                f"| {label} | {n:,} | {i + 1} | {rin:,} |"
                f" {srows:,} | {sbytes / 1024:.0f} |"
                f" {dt:.1f} |" if i == len(rows) - 1 else
                f"| {label} | {n:,} | {i + 1} | {rin:,} |"
                f" {srows:,} | {sbytes / 1024:.0f} | |",
                flush=True,
            )
        shutil.rmtree(work, ignore_errors=True)

    # round-10: the seasonal fused chain's O(streams) claim — the
    # profile rides the closure (not state), so state rows must equal
    # the stream count exactly, input size notwithstanding
    from qualityassurancetool_spark.operators.seasonal import (
        seasonal_profile,
    )
    from qualityassurancetool_spark.streaming.incident_chain import (
        streaming_seasonal_episodes,
    )

    for n in sizes:
        work = tempfile.mkdtemp(prefix="stream_probe_")
        land, ckpt = f"{work}/land", f"{work}/ckpt"
        _feed_chain(spark, land, n, streams=1000)
        hist = spark.read.parquet(land)
        prof = seasonal_profile(hist, "v", "ts", ["g"])
        stream = (
            spark.readStream.schema("g string, ts timestamp, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        t0 = time.perf_counter()
        rows = _run(
            spark,
            streaming_seasonal_episodes(
                stream, prof, "v", "ts", "g",
                nsigma=3.0, max_gap="1h", min_rows=2,
            ),
            ckpt,
        )
        dt = time.perf_counter() - t0
        label = "seasonal→episodes fused (1000 streams)"
        for i, (rin, srows, sbytes) in enumerate(rows):
            print(
                f"| {label} | {n:,} | {i + 1} | {rin:,} |"
                f" {srows:,} | {sbytes / 1024:.0f} |"
                f" {dt:.1f} |" if i == len(rows) - 1 else
                f"| {label} | {n:,} | {i + 1} | {rin:,} |"
                f" {srows:,} | {sbytes / 1024:.0f} | |",
                flush=True,
            )
        shutil.rmtree(work, ignore_errors=True)

    # round-10 (VERDICT r9 item 6): the fusion claim as NUMBERS — the
    # fused chain vs the honest two-query alternative (chart query
    # persisting its rows to parquet, episodes query streaming them
    # back).  Two state stores + an intermediate table vs one; wall is
    # the full drain in both arms.
    import os

    from qualityassurancetool_spark.streaming.control import (
        streaming_cusum,
    )
    from qualityassurancetool_spark.streaming.episodes import (
        streaming_episodes,
    )

    print(
        "\n| arm | input rows | state rows | state KB |"
        " intermediate MB | wall s |"
    )
    print("|---|---|---|---|---|---|")
    for n in sizes:
        # fused arm
        work = tempfile.mkdtemp(prefix="stream_fused_")
        land, ckpt = f"{work}/land", f"{work}/ckpt"
        _feed_chain(spark, land, n, streams=1000)
        stream = (
            spark.readStream.schema("g string, ts timestamp, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        t0 = time.perf_counter()
        rows = _run(
            spark,
            streaming_cusum_episodes(
                stream, "v", "ts", "g", target=10.0, sigma=1.0,
                threshold=5.0, max_gap="1h", min_rows=2,
            ),
            ckpt,
        )
        dt = time.perf_counter() - t0
        srows, sbytes = rows[-1][1], rows[-1][2]
        print(
            f"| fused chart→episodes | {n:,} | {srows:,} |"
            f" {sbytes / 1024:.0f} | 0 | {dt:.1f} |",
            flush=True,
        )
        shutil.rmtree(work, ignore_errors=True)

        # two-query arm: chart rows land in parquet, episodes re-stream
        work = tempfile.mkdtemp(prefix="stream_twoq_")
        land, mid = f"{work}/land", f"{work}/chart"
        _feed_chain(spark, land, n, streams=1000)
        stream = (
            spark.readStream.schema("g string, ts timestamp, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        t0 = time.perf_counter()
        chart = streaming_cusum(
            stream, "v", "ts", "g", target=10.0, sigma=1.0,
            threshold=5.0,
        )
        qa = (
            chart.writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(mid)
            )
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ckpt_a")
            .trigger(availableNow=True)
            .start()
        )
        qa.awaitTermination(300)
        a_ops = [
            p["stateOperators"][0]
            for p in qa.recentProgress
            if p.get("stateOperators")
        ]
        a_rows = a_ops[-1].get("numRowsTotal", 0)
        a_bytes = int(
            a_ops[-1].get("stateMemory")
            or (a_ops[-1].get("customMetrics") or {}).get(
                "stateOnCurrentVersionSizeBytes", 0
            )
        )
        chart_stream = (
            spark.readStream.schema(
                "stream string, t long, value double,"
                " cusum_pos double, cusum_neg double, cusum_flag boolean"
            )
            .parquet(mid)
            .withColumn(
                "excursion", F.greatest("cusum_pos", "cusum_neg")
            )
        )
        rows_b = _run(
            spark,
            streaming_episodes(
                chart_stream, "cusum_flag", "t", "stream",
                value_col="excursion", max_gap="1h", min_rows=2,
            ),
            f"{work}/ckpt_b",
        )
        dt = time.perf_counter() - t0
        mid_mb = sum(
            os.path.getsize(os.path.join(mid, f))
            for f in os.listdir(mid)
            if not f.startswith("_")
        ) / 1e6
        b_rows, b_bytes = rows_b[-1][1], rows_b[-1][2]
        print(
            f"| two queries (chart sink + episodes) | {n:,} |"
            f" {a_rows + b_rows:,} | {(a_bytes + b_bytes) / 1024:.0f} |"
            f" {mid_mb:.1f} | {dt:.1f} |",
            flush=True,
        )
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale probe for the sixth round-3 operator batch: exact heavy
hitters, interval join, Z-order layout, PageRank, SCD2, robust MAD,
semantic decontamination — at 100k-doc / 1M-row scale.

Usage: python tools/scale_probe_r6.py [n_replicas]  (default 20 →
100k docs at sf0.1)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.decontam import (
    semantic_decontaminate,
)
from qualityassurancetool_spark.operators.graph import pagerank
from qualityassurancetool_spark.operators.heavy_hitters import (
    token_heavy_hitters,
)
from qualityassurancetool_spark.operators.interval_join import (
    interval_lookup,
)
from qualityassurancetool_spark.operators.robust import (
    robust_outlier_flags,
)
from qualityassurancetool_spark.operators.scd import scd2_lookup
from qualityassurancetool_spark.schema import load_table
from qualityassurancetool_spark.session import get_spark
from qualityassurancetool_spark.sources.layout import write_zordered
from scale_probe_r3 import replicated_docs
from scale_probe_r4 import timed


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-r6")
    spark.sparkContext.setLogLevel("ERROR")

    docs = replicated_docs(spark, sf_dir, n).persist()
    total = docs.count()
    print(f"# corpus: {total} docs (replication {n}x)")

    # --- exact heavy hitters over the full token stream
    timed(
        "token_heavy_hitters(f=0.002)",
        token_heavy_hitters(docs, min_fraction=0.002),
    )

    # --- 1M-point interval join into 200 overlapping bands
    pts = spark.range(1_000_000).select(
        F.col("id").alias("pid"),
        (F.pmod(F.xxhash64("id"), F.lit(100_000)) / 100.0).alias("x"),
    )
    bands = spark.range(200).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 5.0).alias("lo"),
        (F.col("id") * 5.0 + 8.0).alias("hi"),
    )
    timed(
        "interval_lookup(1M x 200)",
        interval_lookup(
            pts, bands, "x", bucket_width=5.0, broadcast_intervals=True
        ).groupBy("band_id").count(),
    )

    # --- Z-order write of 1M 2-D points
    pts2 = spark.range(1_000_000).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000)) / 100.0).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) / 100.0).alias(
            "y"
        ),
    )
    with tempfile.TemporaryDirectory() as td:
        t0 = time.monotonic()
        write_zordered(
            pts2, f"{td}/z", "x", (0.0, 100.0), "y", (0.0, 100.0),
            n_files=32,
        )
        print(f"# write_zordered(1M): {time.monotonic() - t0:.2f}s")

    # --- PageRank, 1M-edge synthetic graph, 5 rounds
    nodes = 200_000
    base = spark.range(nodes)
    edges = None
    for a, b in ((7, 3), (13, 5), (29, 11), (37, 17), (53, 23)):
        e = base.select(
            F.col("id").alias("src"),
            ((F.col("id") * a + b) % nodes).alias("dst"),
        )
        edges = e if edges is None else edges.union(e)
    edges = edges.repartition(32, "src").persist()
    print(f"# edges: {edges.count()}")
    # pagerank's per-round localCheckpoints are EAGER — time the call,
    # not just the final count
    t0 = time.monotonic()
    ranks = pagerank(edges, iters=5)
    nr = ranks.count()
    print(
        f"# pagerank(1M edges, 5 iters): {time.monotonic() - t0:.2f}s "
        f"rows={nr}"
    )

    # --- SCD2: 1.5M orders-style facts vs 3-version dimension
    cust = load_table(spark, sf_dir, "customer")
    vers = spark.range(3).select(F.col("id").alias("v"))
    dim = cust.crossJoin(vers).select(
        F.col("c_custkey").alias("k"),
        F.date_add(
            F.lit("1992-01-01").cast("date"), (F.col("v") * 800).cast("int")
        ).alias("valid_from"),
        F.when(
            F.col("v") < 2,
            F.date_add(
                F.lit("1992-01-01").cast("date"),
                ((F.col("v") + 1) * 800).cast("int"),
            ),
        )
        .otherwise(F.lit("9999-12-31").cast("date"))
        .alias("valid_to"),
        F.concat_ws("#", F.col("c_mktsegment"), F.col("v")).alias("seg"),
    )
    facts = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("k"), "o_orderdate"
    )
    big_facts = facts.crossJoin(
        spark.range(10).select(F.col("id").alias("_r"))
    ).select(
        (F.col("o_orderkey") * 10 + F.col("_r")).alias("o_orderkey"),
        "k",
        "o_orderdate",
    )
    timed(
        "scd2_lookup(1.5M x 3 versions)",
        scd2_lookup(big_facts, dim, "k", "o_orderdate").groupBy(
            "seg"
        ).count(),
    )

    # --- robust MAD outliers over 1M values x 5 groups
    ev = load_table(spark, sf_dir, "events")
    big_ev = ev.crossJoin(
        spark.range(10).select(F.col("id").alias("_r"))
    ).select(
        (F.col("event_id") * 10 + F.col("_r")).alias("event_id"),
        "event_type",
        (F.col("value") + F.col("_r") * 0.01).alias("value"),
    )
    timed(
        "robust_outliers(1M)",
        robust_outlier_flags(big_ev, "value", "event_type")
        .groupBy("event_type", "is_outlier")
        .count(),
    )

    # --- semantic decontamination: 80k corpus vs 50-vector benchmark
    emb = load_table(spark, sf_dir, "embeddings")
    reps = spark.range(40).select(F.col("id").alias("_rep"))
    big_emb = emb.crossJoin(reps).select(
        (F.col("vec_id") * 40 + F.col("_rep")).alias("vec_id"),
        "embedding",
    )
    bench = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in emb.where(F.col("vec_id") % 40 == 0)
        .limit(50)
        .select("vec_id", "embedding")
        .collect()
    ]
    timed(
        "semantic_decontam(80k x 50)",
        semantic_decontaminate(big_emb, bench, threshold=0.95)
        .groupBy("contaminated")
        .count(),
    )

    spark.stop()


if __name__ == "__main__":
    main()

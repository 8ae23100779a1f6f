"""Scale probe for the round-2 pipeline operators:

1. connected components — synthetic graph with ~1M edges (mixture of
   large rings, stars, and pair chains → non-trivial diameters), timing
   the DISTRIBUTED label-propagation path and verifying it against the
   driver union-find on the same edges;
2. benchmark decontamination — documents replicated n× with id-salted
   text mutations, timing the broadcast-semi-join pipeline beyond
   bench scale.

Usage: python tools/scale_probe_ops.py [n_edges] [n_doc_replicas]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.components import (
    connected_components,
)
from qualityassurancetool_spark.operators.decontam import (
    benchmark_ngram_overlap,
)
from qualityassurancetool_spark.operators.sampling import uniform_hash
from qualityassurancetool_spark.schema import load_table
from qualityassurancetool_spark.session import get_spark


def probe_cc(spark, n_edges: int) -> None:
    # ring edges (i, i+1 mod ring) inside rings of 1000 → diameter 500;
    # plus star edges to stress skewed degree
    n_nodes = n_edges
    base = spark.range(n_nodes).select(F.col("id").alias("a"))
    ring = base.select(
        "a",
        (
            (F.col("a") % 1000 + 1) % 1000 + (F.col("a") - F.col("a") % 1000)
        ).alias("b"),
    )
    stars = base.where(F.col("a") % 97 == 0).select(
        "a", (F.col("a") - F.col("a") % 100_000).alias("b")
    )
    edges = ring.unionByName(stars).where(F.col("a") != F.col("b"))
    edges = edges.select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
    n = edges.count()
    t0 = time.perf_counter()
    cc = connected_components(edges, strategy="distributed")
    stats = cc.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.countDistinct("component").alias("components"),
        F.sum("component").alias("label_sum"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"cc distributed: {n:,} edges -> {stats['nodes']:,} nodes, "
        f"{stats['components']:,} components in {dt:.1f}s "
        f"(label_sum={stats['label_sum']})"
    )
    # verify against driver union-find on the same edge list
    t0 = time.perf_counter()
    local = connected_components(edges, strategy="local")
    lstats = local.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.countDistinct("component").alias("components"),
        F.sum("component").alias("label_sum"),
    ).collect()[0]
    dt_l = time.perf_counter() - t0
    agree = (
        lstats["nodes"] == stats["nodes"]
        and lstats["components"] == stats["components"]
        and lstats["label_sum"] == stats["label_sum"]
    )
    print(f"cc local:       same edges in {dt_l:.1f}s  agree={agree}")
    if not agree:
        raise SystemExit("strategy mismatch")


def probe_decontam(spark, n_rep: int) -> None:
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    big = (
        docs.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(n_rep - 1)))
        )
        .select(
            (F.col("doc_id") * n_rep + F.col("_r")).alias("doc_id"),
            # salt replica text so replicas are not byte-identical
            F.concat_ws(
                " ", F.col("text"), F.concat(F.lit("rep"), F.col("_r"))
            ).alias("text"),
        )
        .repartition(64)
        .persist()
    )
    n = big.count()
    is_b = uniform_hash(F.col("doc_id"), salt="bench:") < 0.01
    t0 = time.perf_counter()
    out = benchmark_ngram_overlap(big.where(~is_b), big.where(is_b), k=3)
    got = out.agg(
        F.count(F.lit(1)).alias("contaminated"),
        F.sum("n_overlap").alias("overlap_total"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"decontam: {n:,} docs -> {got['contaminated']:,} contaminated "
        f"in {dt:.1f}s (overlap_total={got['overlap_total']})"
    )
    big.unpersist()


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("scale-probe-ops")
    spark.sparkContext.setLogLevel("ERROR")
    probe_cc(spark, n_edges)
    probe_decontam(spark, n_rep)
    spark.stop()


if __name__ == "__main__":
    main()

"""Triangle-counting skew probe: degree ordering vs naive orientation
on a hub-heavy graph — measuring the Suri–Vassilvitskii "curse of the
last reducer" claim instead of asserting it.

Graph: ``n_ring`` ring edges (i — i+1, closing triangles with hubs),
plus ``n_hubs`` hubs each connected to ``hub_deg`` consecutive ring
nodes (hub h covers a contiguous block, so every covered ring edge
closes a triangle).  With id-ordered (naive) orientation a hub with
degree d fans out ~d²/2 wedges from one task; degree ordering moves
every hub-incident wedge to the ring-node side (degree ~4), so no
task ever materializes a hub's neighbor square.

Usage: python tools/scale_probe_triangles.py [n_ring] [hub_deg]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def build_edges(spark, n_ring: int, n_hubs: int, hub_deg: int):
    # hubs take ids 0..n_hubs-1 (the SMALLEST ids): a naive
    # min-id-first orientation then points every hub edge OUT of the
    # hub, which is exactly how real web graphs bite — crawl seeds and
    # portal pages are old, low-id, high-degree
    ring = spark.range(n_ring).select(
        (F.col("id") + n_hubs).alias("src"),
        ((F.col("id") + 1) % n_ring + n_hubs).alias("dst"),
    )
    hubs = (
        spark.range(n_hubs)
        .select(F.col("id").alias("h"))
        .crossJoin(spark.range(hub_deg).select(F.col("id").alias("j")))
        .select(
            F.col("h").alias("src"),
            (
                (F.col("h") * hub_deg + F.col("j")) % n_ring + n_hubs
            ).alias("dst"),
        )
    )
    return ring.unionByName(hubs)


def naive_triangles(edges: DataFrame) -> int:
    """Same algorithm as operators/graph.triangle_count but oriented
    by ID ONLY — the control arm that fans wedges out of the hubs."""
    e = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    e1 = e.select(F.col("u").alias("w0"), F.col("v").alias("w1"))
    e2 = e.select(F.col("u").alias("w0"), F.col("v").alias("w2"))
    wedges = e1.join(e2, "w0").where(F.col("w1") < F.col("w2"))
    tris = wedges.join(
        e,
        (F.col("w1") == F.col("u")) & (F.col("w2") == F.col("v")),
        "leftsemi",
    )
    return tris.count()


def main() -> None:
    import os

    from qualityassurancetool_spark.operators.graph import triangle_count
    from qualityassurancetool_spark.session import get_spark

    n_ring = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    hub_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_hubs = max(1, n_ring // hub_deg)
    os.environ["SPARK_GRAFT_UI"] = "1"
    spark = get_spark("tri-skew")
    spark.sparkContext.setLogLevel("ERROR")
    from dress_rehearsal import ui_totals

    edges = build_edges(spark, n_ring, n_hubs, hub_deg)
    path = "/tmp/tri_edges"
    edges.write.mode("overwrite").parquet(path)
    edges = spark.read.parquet(path)
    print(
        f"graph: {n_ring:,} ring nodes, {n_hubs} hubs of degree "
        f"{hub_deg:,} -> expect ~{n_ring:,} hub triangles + ring"
    )
    for label, fn in (
        ("degree-ordered", lambda: triangle_count(edges)
            .agg(F.sum("n_triangles")).collect()[0][0] // 3),
        ("naive id-ordered", lambda: naive_triangles(edges)),
    ):
        before = ui_totals(spark)
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        d = {k: v - before[k] for k, v in ui_totals(spark).items()}
        print(
            f"| {label} | triangles={n:,} | wall {dt:.1f}s "
            f"| shufW {d['shuffle_write']/1e6:.1f} MB "
            f"| spill {(d['spill_mem']+d['spill_disk'])/1e6:.0f} MB |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Graph-family dress rehearsal (VERDICT r10 item 5): PageRank and
k-core UI-metered at a 1M → 10M-edge decade, the treatment every other
hot family already has.

Corpus: a deterministic power-law-ish web graph — node count =
edges/10, destination ids drawn from a quadratic transform of an
md5-uniform so low ids become hubs (max in-degree ~ thousands at 10M
edges) while the src side stays uniform.  No rand(): re-runs are
bit-identical.

The 100 TB claims this probe checks:

  - PER-ROUND shuffle ∝ edges (each power-iteration round exchanges
    the (dst, contrib) partial aggregate and the rank join — nothing
    rank-history-sized ever accumulates);
  - the ``localCheckpoint`` lineage discipline HOLDS at the decade:
    the returned frame's plan is a constant-size LogicalRDD scan
    regardless of iteration count (without it, the plan nests one
    join-tree per round and the driver eventually OOMs on analysis);
  - k-core's peel only ever SHRINKS the edge table: per-round shuffle
    is bounded by the current edge count, and the cascade terminates
    in a handful of waves on a power-law graph;
  - driver heap stays flat across the decade (the iterative state
    lives in executor blocks, not the driver).

Usage: python tools/dress_rehearsal_graph.py [n_edges ...]
       default: 1000000 10000000
Prints markdown rows; paste into docs/SCALE.md.  Writes only under
/tmp/dress_graph.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from dress_rehearsal import Meter  # noqa: E402  (UI metering reuse)

ROOT = "/tmp/dress_graph"


def edges(spark, n_edges: int):
    """Deterministic hub-skewed edge list: src uniform over nodes, dst
    = nodes × u² for an md5 uniform u (quadratic → low ids are hubs).
    Repartition the 8-byte id frame BEFORE the md5 expansion (the
    narrow-rows-first shuffle rule every generator here follows)."""
    n_nodes = max(n_edges // 10, 100)
    base = spark.range(n_edges).repartition(32)

    def u(salt: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("id"), F.lit(salt))), 1, 8
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16**8))
        )

    return base.select(
        (u("s") * n_nodes).cast("long").alias("src"),
        (u("d") * u("d2") * n_nodes).cast("long").alias("dst"),
    )


def plan_nodes(df) -> int:
    """Size of the OPTIMIZED plan — the lineage-truncation check: a
    localCheckpoint'd result scans one LogicalRDD no matter how many
    rounds produced it."""
    return len(
        df._jdf.queryExecution().optimizedPlan().toString().splitlines()
    )


def driver_heap_mb(spark) -> float:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    spark.sparkContext._jvm.System.gc()
    return float(rt.totalMemory() - rt.freeMemory()) / 1e6


def main() -> None:
    from qualityassurancetool_spark.operators.graph import k_core, pagerank
    from qualityassurancetool_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    os.makedirs(ROOT, exist_ok=True)
    os.environ["SPARK_GRAFT_UI"] = "1"
    spark = get_spark("dress-graph")
    spark.sparkContext.setLogLevel("ERROR")

    print(
        "| stage | edges | wall s | out rows | input MB | shufW MB "
        "| shufR MB | spillM MB | spillD MB |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    iters = 5
    for n in sizes:
        path = os.path.join(ROOT, f"edges_{n}")
        m = Meter(spark)
        m.stage(
            "edge list write", n,
            lambda: edges(spark, n).write.mode("overwrite").parquet(path)
            or n,
        )
        e = spark.read.parquet(path)

        state = {}

        def _pr():
            state["pr"] = pagerank(e, iters=iters)
            return state["pr"].count()

        m.stage(f"pagerank {iters} rounds", n, _pr)
        pr_row = m.rows[-1]
        print(
            f"  per-round shuffle ≈ {pr_row['shuffle_write'] / iters:.1f} "
            f"MB write / {pr_row['shuffle_read'] / iters:.1f} MB read; "
            f"result plan = {plan_nodes(state['pr'])} lines "
            "(localCheckpoint scan — constant in rounds); "
            f"driver heap after = {driver_heap_mb(spark):.0f} MB",
            flush=True,
        )

        # strategy pinned: the rehearsal meters the DISTRIBUTED peel
        # (auto would collect graphs at/under the 1M-edge local
        # threshold and meter the driver instead of the cluster shape)
        m.stage(
            "k-core k=3 peel", n,
            lambda: k_core(e, 3, strategy="distributed").count(),
        )
        print(
            f"  driver heap after = {driver_heap_mb(spark):.0f} MB",
            flush=True,
        )

    # lineage-truncation control: double the rounds, the result plan
    # must not grow (without localCheckpoint it nests per round)
    e1 = spark.read.parquet(os.path.join(ROOT, f"edges_{sizes[0]}"))
    p5 = plan_nodes(pagerank(e1.limit(200_000), iters=5))
    p10 = plan_nodes(pagerank(e1.limit(200_000), iters=10))
    print(
        f"\nlineage check: plan lines at 5 rounds = {p5}, "
        f"at 10 rounds = {p10} "
        f"({'FLAT — discipline holds' if p10 <= p5 + 2 else 'GROWING — REGRESSION'})"
    )
    if p10 > p5 + 2:
        raise SystemExit("pagerank lineage grows with iteration count")

    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()

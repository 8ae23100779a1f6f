"""ANN serving dress rehearsal (VERDICT r6 item 6): meter the IVFADC
pipeline — fit, residual-PQ encode, probed-list ADC search, exact
rerank — at 1 M and 10 M vectors, pulling shuffle/spill/input bytes
from the Spark UI REST API per stage (same methodology as
``tools/dress_rehearsal.py``).

Corpus: synthetic dim-64 float vectors shaped like the `embeddings`
testdata table — per-id deterministic pseudo-random components from
md5-derived uniforms (no rand(): re-runs are bit-identical), with a
mild cluster structure (8 latent centers) so the coarse quantizer has
something real to find.

The 100 TB claims this probe checks:

  - encode is ONE pass over the corpus (input ≈ corpus bytes, no
    quadratic shuffle);
  - search work scales with the PROBED fraction, not corpus size —
    the (cluster_id IN probed) filter must reach the scan;
  - rerank touches only the shortlist (queries × R rows);
  - nothing spills at 10 M × 64 floats on 32 threads.

Usage: python tools/dress_rehearsal_ann.py [n_vecs ...]
       default: 1000000 10000000  (the 10x decade pair)
Prints one markdown row per (stage, size); paste into docs/SCALE.md.
Writes only under /tmp/dress_ann.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from dress_rehearsal import Meter  # noqa: E402  (UI metering reuse)

ROOT = "/tmp/dress_ann"
DIM = 64
N_CENTERS = 8
N_QUERIES = 8


def corpus(spark, n_vecs: int):
    """Deterministic clustered vectors: component d of vector i is
    center(i mod 8)[d] + uniform noise from md5(i, d) — pure Column
    math, shuffle-free generation."""
    # repartition the ID-ONLY frame (8 B/row) BEFORE the 64-component
    # md5 expansion: shuffling after expansion moves 512 B/row arrays
    # (4.5 GB + spill at 10 M); shuffling ids first moves ~80 MB and the
    # expensive columns are computed on their final partitions.
    base = (
        spark.range(n_vecs)
        .repartition(32)
        .select(F.col("id").alias("vec_id"))
    )
    center = (F.col("vec_id") % N_CENTERS).cast("int")
    comps = []
    for d in range(DIM):
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("vec_id"), F.lit(d))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16**8))
        )
        c_off = F.when(center == (d % N_CENTERS), F.lit(3.0)).otherwise(
            F.lit(0.0)
        )
        comps.append((u + c_off).cast("double"))
    return base.select("vec_id", F.array(*comps).alias("embedding"))


def run(spark, n_vecs: int) -> None:
    from qualityassurancetool_spark.operators.pq import (
        ivfadc_fit,
        ivfadc_index,
        ivfadc_topk,
    )
    from qualityassurancetool_spark.operators.similarity import exact_rerank

    path = os.path.join(ROOT, f"vecs_{n_vecs}")
    m = Meter(spark)

    m.stage(
        "vector corpus write", n_vecs,
        lambda: corpus(spark, n_vecs)
        .write.mode("overwrite")
        .parquet(path)
        or n_vecs,
    )
    vecs = spark.read.parquet(path)

    fitted = {}

    def _fit():
        # fit on a bounded stride sample — the fit cost must NOT scale
        # with the corpus (the 100 TB contract: sample, then one pass)
        stride = max(n_vecs // 100_000, 1)
        sample = vecs.where(F.col("vec_id") % stride == 0)
        cents, books = ivfadc_fit(
            sample, n_lists=16, m=4, k=16, max_iter=3
        )
        fitted["cents"], fitted["books"] = cents, books
        return len(cents)

    m.stage("ivfadc fit (strided sample)", n_vecs, _fit)

    index = {}

    def _encode():
        idx = ivfadc_index(
            vecs, fitted["cents"], fitted["books"], strategy="gemm"
        ).persist()
        n = idx.count()
        index["df"] = idx
        return n

    m.stage("ivfadc encode (one pass)", n_vecs, _encode)

    queries = (
        vecs.where(F.col("vec_id") % max(n_vecs // N_QUERIES, 1) == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .collect()
    )
    qdf = None

    def _search():
        nonlocal qdf
        from qualityassurancetool_spark.functions.literals import (
            literal_rows_df,
        )

        qdf = literal_rows_df(
            spark,
            [(int(r[0]), [float(x) for x in r[1]]) for r in queries],
            "query_id long, embedding array<double>",
        )
        short = ivfadc_topk(
            index["df"],
            qdf,
            fitted["cents"],
            fitted["books"],
            k=100,
            nprobe=2,
        ).persist()
        n = short.count()
        index["short"] = short
        return n

    m.stage("adc search k=100 nprobe=2", n_vecs, _search)

    m.stage(
        "exact rerank R=100->10", n_vecs,
        lambda: exact_rerank(
            index["short"], vecs, qdf, k=10
        ).count(),
    )

    # the disk lifecycle: persist the index as cluster_id-partitioned
    # inverted lists, then search FROM DISK — input bytes must track the
    # probed share (nprobe/n_lists of the layout + footers), proving the
    # static IN literal reaches the scan as a partition filter
    from qualityassurancetool_spark.operators.pq import (
        ivfadc_read,
        ivfadc_write,
    )

    layout = os.path.join(ROOT, f"ivf_layout_{n_vecs}")
    m.stage(
        "ivf layout write (partitioned)", n_vecs,
        lambda: ivfadc_write(
            index["df"], layout, files_per_list=2, n_lists=16
        )
        or n_vecs,
    )
    disk = ivfadc_read(spark, layout)
    # prune_batches: the serving-at-scale switch — without it the
    # ranking window sorts every scored probed-list row (822 MB spill
    # at 100 M vectors); with it each Arrow batch keeps its k best per
    # query first (value-exact)
    disk_short = ivfadc_topk(
        disk, qdf, fitted["cents"], fitted["books"], k=100, nprobe=2,
        prune_batches=True,
    )
    # the serving contract, asserted AT THIS SCALE (not just in the
    # small-scale tests/test_pq.py): the static `cluster_id IN probed`
    # literal must resolve to directory-level PartitionFilters on the
    # layout scan, so unprobed lists' files are never opened
    plan = disk_short._jdf.queryExecution().executedPlan().toString()
    pf = [
        ln.strip()
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "cluster_id" in ln
    ]
    print(
        f"  plan assert @ {n_vecs:,}: PartitionFilters with cluster_id "
        f"{'PRESENT' if pf else 'MISSING — REGRESSION'}"
    )
    if not pf:
        raise SystemExit("disk-layout search lost its PartitionFilters")
    m.stage(
        "adc search from disk layout", n_vecs,
        lambda: disk_short.count(),
    )
    index["df"].unpersist()
    index["short"].unpersist()


def main() -> None:
    from qualityassurancetool_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    os.makedirs(ROOT, exist_ok=True)
    os.environ["SPARK_GRAFT_UI"] = "1"
    spark = get_spark("dress-rehearsal-ann")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        "| stage | vecs | wall s | out rows | input MB | shufW MB "
        "| shufR MB | spillM MB | spillD MB |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for n in sizes:
        run(spark, n)
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()

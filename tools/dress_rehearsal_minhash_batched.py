"""MinHash third-decade rehearsal (VERDICT r7 item 5): the monolithic
banding pipeline vs the band-batched schedule
(``operators/dedup.minhash_dedup_batched``) at 1 M / 10 M docs, metering
what decides single-JVM survival at 100 M — TOTAL shuffle volume and the
PEAK single-stage shuffle (the working set one exchange must hold at
once), plus spill.

The batched schedule's claim: peak banding state per pass shrinks to
``1/band_batches`` of the monolithic exchange, for one extra corpus
write and ``band_batches`` column-pruned re-reads — so a corpus whose
full banding shuffle exceeds executor memory processes in bounded
passes instead of thrash-spilling.  This tool measures that claim; the
resulting table and the 100 M-doc regime math live in ``docs/SCALE.md``.

Usage: python tools/dress_rehearsal_minhash_batched.py [n_docs ...]
       default: 1000000 10000000
Reuses /tmp/dress corpora when present (same generator as
tools/dress_rehearsal.py).  Set QAT_DRIVER_MEM=24g (see docs/SCALE.md —
the 64g heap triggers a THP sys-time storm on the bench box).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

ROOT = "/tmp/dress"


def run(spark, n_docs: int) -> None:
    from dress_rehearsal import completed_stages, corpus

    from qualityassurancetool_spark.operators.dedup import (
        minhash_dedup,
        minhash_dedup_batched,
    )

    docs_path = os.path.join(ROOT, f"docs_{n_docs}")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        corpus(spark, n_docs).write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)

    def meter(label: str, fn) -> None:
        before = {s["stageId"] for s in completed_stages(spark)}
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        stages = [
            s for s in completed_stages(spark) if s["stageId"] not in before
        ]
        tot_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        peak_w = max(
            (s.get("shuffleWriteBytes", 0) for s in stages), default=0
        )
        sp_m = sum(s.get("memoryBytesSpilled", 0) for s in stages)
        sp_d = sum(s.get("diskBytesSpilled", 0) for s in stages)
        print(
            f"| {label} | {n_docs:,} | {dt:.1f} | {out:,} "
            f"| {tot_w/1e6:.1f} | {peak_w/1e6:.1f} | {sp_m/1e6:.0f} "
            f"| {sp_d/1e6:.0f} |",
            flush=True,
        )

    # QAT_MINHASH_VARIANTS selects runs: "mono,batched:2,batched:4"
    # (default).  "batched:16" exercises the round-9 sub-band
    # hash-sliced passes (band_batches > bands) without paying the
    # known-OOM monolithic run at 30 M docs.  "batched:16:slim" runs
    # the round-10 store_shingles=False storage mode (sig parquet
    # holds only the 16 signature longs; verify recomputes shingles
    # from text) — the disk-bound path that makes the 100 M-doc row
    # measurable in this container.
    spec = os.environ.get("QAT_MINHASH_VARIANTS", "mono,batched:2,batched:4")
    for variant in spec.split(","):
        variant = variant.strip()
        if variant == "mono":
            meter(
                "minhash monolithic",
                lambda: minhash_dedup(
                    docs, threshold=0.7, hash_mode="fast"
                ).count(),
            )
        else:
            parts = variant.split(":")
            nb = int(parts[1])
            slim = len(parts) > 2 and parts[2] == "slim"
            work = os.path.join(
                ROOT, f"mhb_{n_docs}_{nb}" + ("_slim" if slim else "")
            )
            meter(
                f"minhash batched B={nb}" + (" slim" if slim else ""),
                lambda nb=nb, slim=slim, work=work: minhash_dedup_batched(
                    docs,
                    work,
                    threshold=0.7,
                    hash_mode="fast",
                    band_batches=nb,
                    store_shingles=not slim,
                ).count(),
            )
            sig = os.path.join(work, "sig")
            if os.path.isdir(sig):
                nbytes = sum(
                    os.path.getsize(os.path.join(sig, f))
                    for f in os.listdir(sig)
                    if f.endswith(".parquet")
                )
                print(
                    f"  sig parquet: {nbytes/1e9:.2f} GB "
                    f"({'slim' if slim else 'full'})",
                    flush=True,
                )


def main() -> None:
    from qualityassurancetool_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    os.makedirs(ROOT, exist_ok=True)
    os.environ["SPARK_GRAFT_UI"] = "1"
    spark = get_spark("dress-minhash-batched")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        "| variant | docs | wall s | pairs | shufW MB | peak-stage "
        "shufW MB | spillM MB | spillD MB |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for n in sizes:
        run(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()

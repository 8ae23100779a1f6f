"""Span/fingerprint dedup decade rehearsal: ExactSubstr span removal
(``operators/span_dedup``) and winnowing fingerprints
(``operators/fingerprint``, kernel strategy) at 1 M / 10 M docs — the
one dedup family whose round-4 measurements stopped at 100 k docs.

What decides 100 TB survival here is the WINDOW-HASH exchange: span
dedup shuffles one (hash, doc, pos) row per token position (the
corpus's token count, ~25× the minhash banding volume at these doc
lengths), and fingerprints shuffle ~2/(w+1) rows per character.  This
tool meters total/peak shuffle and spill for both so the regime note in
docs/SCALE.md is measured, not asserted.

Usage: python tools/dress_rehearsal_spans.py [n_docs ...]
       default: 1000000 4000000
Reuses /tmp/dress corpora (same generator as tools/dress_rehearsal.py).
Set QAT_DRIVER_MEM=24g (see docs/SCALE.md).
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

    from qualityassurancetool_spark.operators.fingerprint import (
        fingerprint_overlap_pairs,
    )
    from qualityassurancetool_spark.operators.span_dedup import (
        duplicated_span_dedup,
    )
    from pyspark.sql import functions as F

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

    meter(
        "span dedup (L=20, fast)",
        # consume the rebuilt text: a bare count() would let Catalyst
        # prune the clean-text rebuild to the pair agg alone
        lambda: duplicated_span_dedup(docs, hash_mode="fast")
        .agg(F.sum("n_tokens_removed"))
        .collect()[0][0],
    )
    from qualityassurancetool_spark.operators.span_dedup import (
        duplicated_span_dedup_batched,
    )

    meter(
        "span dedup batched B=4",
        lambda: duplicated_span_dedup_batched(
            docs,
            os.path.join(ROOT, f"spans_{n_docs}"),
            hash_mode="fast",
            hash_batches=4,
        )
        .agg(F.sum("n_tokens_removed"))
        .collect()[0][0],
    )
    meter(
        "fingerprint pairs (k=20, w=8, kernel)",
        lambda: fingerprint_overlap_pairs(
            docs, strategy="kernel", hash_mode="fast"
        ).count(),
    )


def main() -> None:
    from qualityassurancetool_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    os.makedirs(ROOT, exist_ok=True)
    os.environ["SPARK_GRAFT_UI"] = "1"
    spark = get_spark("dress-spans")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        "| op | docs | wall s | out | shufW MB | peak-stage shufW MB "
        "| spillM MB | spillD MB |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for n in sizes:
        run(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()

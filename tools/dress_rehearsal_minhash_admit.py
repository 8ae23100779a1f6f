"""Incremental-admission rehearsal: verify a 1 %% delta against an
existing N-doc minhash state (`operators/dedup.minhash_admit`) and meter
the cost — the claim is admission ∝ delta + one SCAN of the state (no
corpus-sized shuffle; the state's signature columns are the only thing
read for banding, column-pruned out of the sig parquet).

Variants:

- ``full`` (default): the round-8 arm — full-storage state
  (`/tmp/dress/mhb_<N>_4`), frozen dry-run admission.
- ``slim`` (round-11): the state is built with ``store_shingles=False``
  (the 100 M-doc disk-budget configuration, ~4.3× smaller sig parquet)
  and admission passes ``corpus_text=`` so the verify step recomputes
  state-side shingles from the corpus text for candidate ids only —
  plus ``admission_id=`` so the measured wall includes the retry-
  idempotent slice commit.  The claim under test: slim admission stays
  ∝ delta + one state scan + one map-only corpus TEXT scan (the
  store_shingles=False verify discipline applied to admission).

States and corpora are bootstrapped if missing (reused across runs).
The delta is the SAME crawl-shaped generator's next ids (families are
disjoint from the state's, so most pairs are delta-internal planted
dups — realistic for a fresh crawl day).

Usage: python tools/dress_rehearsal_minhash_admit.py [n_docs] [variant]
       default: 10000000 full   (delta = n_docs // 100)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

ROOT = "/tmp/dress"


def main() -> None:
    from dress_rehearsal import completed_stages, corpus

    from qualityassurancetool_spark.operators.dedup import (
        minhash_admit,
        minhash_dedup_batched,
    )
    from qualityassurancetool_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    variant = sys.argv[2] if len(sys.argv) > 2 else "full"
    if variant not in ("full", "slim"):
        raise SystemExit(f"variant must be full|slim, got {variant!r}")
    slim = variant == "slim"
    n_delta = n // 100
    os.makedirs(ROOT, exist_ok=True)
    os.environ["SPARK_GRAFT_UI"] = "1"
    spark = get_spark("dress-minhash-admit")
    spark.sparkContext.setLogLevel("ERROR")

    docs_path = os.path.join(ROOT, f"docs_{n}")
    state = os.path.join(
        ROOT, f"mhb_{n}_slim16" if slim else f"mhb_{n}_4"
    )
    # _SUCCESS, not the bare dir: a crashed previous run leaves a
    # partial docs dir that must be regenerated, not silently reused
    # as corpus_text (review finding, round 11)
    if not os.path.exists(os.path.join(state, "sig")) or (
        slim and not os.path.exists(os.path.join(docs_path, "_SUCCESS"))
    ):
        if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
            corpus(spark, n).write.mode("overwrite").parquet(docs_path)
        if not os.path.exists(os.path.join(state, "sig")):
            minhash_dedup_batched(
                spark.read.parquet(docs_path), state,
                threshold=0.7, hash_mode="fast",
                band_batches=16 if slim else 4,
                store_shingles=not slim,
            ).count()

    from pyspark.sql import functions as F

    delta = corpus(spark, n + n_delta).where(F.col("doc_id") >= n)

    before = {s["stageId"] for s in completed_stages(spark)}
    t0 = time.perf_counter()
    if slim:
        pairs = minhash_admit(
            delta, state, threshold=0.7, hash_mode="fast",
            admission_id="rehearsal-day1", corpus_text=docs_path,
        ).count()
    else:
        pairs = minhash_admit(
            delta, state, threshold=0.7, hash_mode="fast",
            update_state=False,
        ).count()
    dt = time.perf_counter() - t0
    stages = [
        s for s in completed_stages(spark) if s["stageId"] not in before
    ]
    tot_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    peak_w = max((s.get("shuffleWriteBytes", 0) for s in stages), default=0)
    sp = sum(
        s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
        for s in stages
    )
    # the UI REST inputBytes counts CACHE reads only (file-source scans
    # report 0 on this Spark build — see docs/SCALE.md round-8 note), so
    # the state-scan bound is reported from the parquet layout itself:
    # banding reads the sig columns, verification streams _jid + _sh
    # (full) or recomputes from the corpus text (slim), together ~the
    # sig dir size, read ONCE with zero shuffle.
    state_mb = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(state, "sig"))
        for f in fs
    ) / 1e6
    print(
        "| stage | state docs | delta docs | wall s | pairs "
        "| state sig MB | shufW MB | peak-stage shufW MB "
        "| spill MB |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    print(
        f"| minhash admit ({variant}) | {n:,} | {n_delta:,} | {dt:.1f} "
        f"| {pairs:,} | {state_mb:.0f} | {tot_w/1e6:.1f} "
        f"| {peak_w/1e6:.1f} | {sp/1e6:.0f} |"
    )
    spark.stop()


if __name__ == "__main__":
    main()

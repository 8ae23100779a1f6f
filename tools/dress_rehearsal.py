"""100 TB dress rehearsal (VERDICT r3 item 6): run the dedup family and
the pretraining capstone end-to-end at ≥10× bench scale, recording the
metrics that decide survival at cluster scale — shuffle read/write
bytes, memory/disk spill, input bytes — from the Spark UI REST API, not
wall-clock folklore.

Corpus: synthetic but SHAPED like a crawl — per-doc-distinct hash-word
bodies (~430 B of text each) with controlled duplication planted at
crawl-realistic rates: per 100 docs, one base, one near-duplicate of it
(tiny tail edit) and one exact duplicate, everything else distinct.
That keeps near-dup components small (size ≤ 3) the way real corpora
do — replicating one table n× (the older probes) makes EVERY doc a
member of an n-sized near-dup family, which explodes candidate pairs
quadratically and measures a pathology, not a pipeline.

Stages measured (deltas of completed-stage totals between checkpoints):

  1. corpus write          (scan + shuffle-free generation)
  2. exact dedup           (one groupBy on a 16-byte digest)
  3. MinHash + LSH pairs   (banded equi-join)
  4. connected components  (label propagation rounds)
  5. token heavy hitters   (two-pass Misra-Gries)
  6. pretrain capstone     (curate -> near-dedup -> chunk/pack -> shards)

Usage: python tools/dress_rehearsal.py [n_docs ...]
       default: 100000 1000000  (the 10x pair for the linearity check)
Prints one markdown table row per (stage, size); paste into
docs/SCALE.md.  Nothing is written outside /tmp/dress.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

ROOT = "/tmp/dress"


def completed_stages(spark) -> list[dict]:
    """Completed stages from the Spark UI REST API — THE metering
    snippet; the per-op rehearsal tools import it from here so a REST
    fix lands once (review finding, round 8)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def ui_totals(spark) -> dict:
    """Completed-stage metric totals from the Spark UI REST API."""
    stages = completed_stages(spark)
    keys = {
        "shuffle_write": "shuffleWriteBytes",
        "shuffle_read": "shuffleReadBytes",
        "spill_mem": "memoryBytesSpilled",
        "spill_disk": "diskBytesSpilled",
        "input": "inputBytes",
    }
    return {k: sum(s.get(v, 0) for s in stages) for k, v in keys.items()}


def corpus(spark, n_docs: int):
    """Deterministic crawl-shaped corpus (see module docstring)."""
    # repartition the ID-ONLY frame before the text synthesis: shuffling
    # after expansion moves ~430 B/doc bodies (3.6 GB + spill at 10 M);
    # shuffling ids first moves 8 B/doc and the text is built on its
    # final partitions.
    base = (
        spark.range(n_docs)
        .repartition(32)
        .select(F.col("id").alias("doc_id"))
    )
    kind = F.col("doc_id") % 100
    fam = F.col("doc_id") - kind
    seed = F.when(kind < 3, fam).otherwise(F.col("doc_id"))
    # every 6th word comes from a tiny Zipf head so frequency-family
    # operators (heavy hitters, vocab) see a realistic token skew; the
    # rest are per-doc hash words (near-zero cross-doc shingle overlap)
    head = F.array(*[F.lit(w) for w in
                     ("the", "of", "and", "to", "a", "in", "is", "for")])
    words = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: F.when(
                i % 6 == 0,
                F.element_at(head, (F.crc32(
                    F.concat(seed.cast("string"), i.cast("string"))
                ) % 8 + 1).cast("int")),
            ).otherwise(
                F.substring(
                    F.md5(
                        F.concat(
                            seed.cast("string"), F.lit(":"), i.cast("string")
                        )
                    ),
                    1,
                    6,
                )
            ),
        ),
        " ",
    )
    text = (
        F.when(kind == 1, F.concat(words, F.lit(" tiny tail edit one")))
        .otherwise(words)  # kind 2 == exact copy of the kind-0 base
    )
    return base.select("doc_id", text.alias("text"))


class Meter:
    def __init__(self, spark):
        self.spark = spark
        self.rows = []
        self.last = ui_totals(spark)

    def stage(self, label: str, n_docs: int, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        now = ui_totals(self.spark)
        delta = {k: now[k] - self.last[k] for k in now}
        self.last = now
        row = {"stage": label, "n_docs": n_docs, "wall_s": round(dt, 1),
               "out_rows": out, **{k: round(v / 1e6, 1) for k, v in delta.items()}}
        self.rows.append(row)
        print(
            f"| {label} | {n_docs:,} | {dt:.1f} | {out:,} "
            f"| {delta['input']/1e6:.0f} | {delta['shuffle_write']/1e6:.1f} "
            f"| {delta['shuffle_read']/1e6:.1f} | {delta['spill_mem']/1e6:.0f} "
            f"| {delta['spill_disk']/1e6:.0f} |",
            flush=True,
        )
        return out


def run(spark, n_docs: int) -> None:
    from qualityassurancetool_spark.operators.components import (
        connected_components,
    )
    from qualityassurancetool_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup,
    )
    from qualityassurancetool_spark.operators.heavy_hitters import (
        token_heavy_hitters,
    )
    from qualityassurancetool_spark.plans.pretrain import (
        PretrainConfig,
        run_pretrain_pipeline,
    )

    docs_path = os.path.join(ROOT, f"docs_{n_docs}")
    out_dir = os.path.join(ROOT, f"out_{n_docs}")
    m = Meter(spark)

    m.stage(
        "corpus write", n_docs,
        lambda: corpus(spark, n_docs)
        .write.mode("overwrite")
        .parquet(docs_path)
        or n_docs,
    )
    docs = spark.read.parquet(docs_path)
    m.stage("exact dedup", n_docs, lambda: exact_dedup(docs).count())
    pairs = None

    def _minhash():
        nonlocal pairs
        pairs = minhash_dedup(docs, threshold=0.7, hash_mode="fast")
        pairs = pairs.persist()
        return pairs.count()

    m.stage("minhash+LSH pairs", n_docs, _minhash)
    m.stage(
        "connected components", n_docs,
        lambda: connected_components(pairs).count(),
    )
    pairs.unpersist()
    m.stage(
        "token heavy hitters", n_docs,
        lambda: token_heavy_hitters(docs, min_fraction=0.001).count(),
    )

    def _cms():
        from qualityassurancetool_spark.functions.hashing import tokens
        from qualityassurancetool_spark.operators.cms import cms_build

        stream = docs.select(
            F.explode(tokens(F.col("text"))).alias("k")
        ).where(F.length("k") > 0)
        return cms_build(stream, "k", width=2048, depth=4).count()

    m.stage("count-min sketch", n_docs, _cms)

    def _badwords():
        from qualityassurancetool_spark.operators.multipattern import (
            match_counts,
        )

        return (
            match_counts(docs, ["the ", "tiny tail", "zzzz"])
            .where(F.col("n_matches") > 0)
            .count()
        )

    m.stage("aho-corasick screen", n_docs, _badwords)

    def _bm25():
        from qualityassurancetool_spark.functions.hashing import tokens
        from qualityassurancetool_spark.operators.bm25 import bm25_topk

        stride = max(n_docs // 8, 1)
        queries = docs.where(F.col("doc_id") % stride == 0).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(
                    F.filter(
                        tokens(F.col("text")), lambda t: F.length(t) > 0
                    ),
                    1,
                    5,
                ),
                " ",
            ).alias("query_text"),
        )
        return bm25_topk(docs, queries, k=10).count()

    m.stage("bm25 retrieval", n_docs, _bm25)
    cfg = PretrainConfig.from_dict(
        {
            "curation": {"max_word_rep_ratio": 0.9, "dedup": "exact"},
            "near_dedup": True,
            "minhash_threshold": 0.7,
            "chunk_tokens": 64,
            "overlap_tokens": 8,
            "pack_budget": 256,
            "n_shards": 16,
        }
    )
    m.stage(
        "pretrain capstone", n_docs,
        lambda: run_pretrain_pipeline(docs, cfg, out_dir)["n_chunks"],
    )


def main() -> None:
    from qualityassurancetool_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    os.makedirs(ROOT, exist_ok=True)
    # the packaged session disables the UI for throughput; this probe
    # exists to READ the UI metrics API, so turn it back on first
    os.environ["SPARK_GRAFT_UI"] = "1"
    spark = get_spark("dress-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        "| stage | docs | wall s | out rows | input MB | shufW MB "
        "| shufR MB | spillM MB | spillD MB |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for n in sizes:
        run(spark, n)
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()

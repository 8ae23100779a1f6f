"""Scale probe for the fifth round-3 operator batch: DSIR importance
resampling, corpus-wide line dedup + C4 rules, Bloom membership
screening, corpus report, snapshot diff — at 100k-doc scale.

The Bloom probe also answers the design question the operator exists
for: at how many keys does a bit-signature screen beat the plain
broadcast semi join?  (The semi join broadcasts/hashes every key
string; the Bloom literal is m/32 longs regardless of key count.)

Usage: python tools/scale_probe_r5.py [n_replicas]  (default 20 →
100k docs at sf0.1)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.bloom import (
    bloom_parameters,
    build_bloom,
    with_might_contain,
)
from qualityassurancetool_spark.operators.dsir import (
    dsir_resample,
    fit_log_ratio,
)
from qualityassurancetool_spark.operators.line_dedup import (
    c4_clean,
    corpus_line_dedup,
)
from qualityassurancetool_spark.operators.snapshot import snapshot_diff
from qualityassurancetool_spark.plans.corpus_report import corpus_report
from qualityassurancetool_spark.session import get_spark
from scale_probe_r3 import replicated_docs
from scale_probe_r4 import timed


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-r5")
    spark.sparkContext.setLogLevel("ERROR")

    docs = replicated_docs(spark, sf_dir, n).persist()
    total = docs.count()
    print(f"# corpus: {total} docs (replication {n}x)")

    # --- DSIR: fit on target slice, score+select the full corpus
    t0 = time.monotonic()
    lr = fit_log_ratio(
        raw=docs,
        target=docs.where(F.col("lang") == "en"),
        n_buckets=8192,
        hash_mode="fast",
    )
    print(f"# dsir_fit(8192 buckets, fast): {time.monotonic() - t0:.2f}s")
    timed(
        "dsir_resample(k=10000, fast)",
        dsir_resample(docs, lr, k=10_000, hash_mode="fast"),
    )

    # --- line-structured twin corpus for the line family
    lined = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.replace(F.col("text"), F.lit(" the "), F.lit(".\n")),
            F.lit("\nShared boilerplate footer variant "),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(" all rights reserved."),
        ).alias("text"),
    ).persist()
    lined.count()
    timed("c4_clean", c4_clean(lined))
    timed("corpus_line_dedup", corpus_line_dedup(lined))

    # --- Bloom screen vs broadcast semi join at 1M keys
    n_keys = 1_000_000
    keys = spark.range(n_keys).select(
        F.concat(F.lit("key"), (F.col("id") * 3).cast("string")).alias("v")
    )
    probe = spark.range(2_000_000).select(
        "id", F.concat(F.lit("key"), F.col("id").cast("string")).alias("v")
    ).persist()
    probe.count()
    t0 = time.monotonic()
    m_bits, k = bloom_parameters(n_keys, fpp=0.01)
    words = build_bloom(keys, "v", m_bits, k)
    print(
        f"# bloom_build({n_keys} keys, m={m_bits} bits, k={k}): "
        f"{time.monotonic() - t0:.2f}s ({m_bits // 8 // 1024} KB literal)"
    )
    timed(
        "bloom_screen(2M probes)",
        with_might_contain(probe, "v", words, k, "_m")
        .where(F.col("_m"))
        .drop("_m"),
    )
    timed(
        "broadcast_semi_join(2M probes, 1M keys)",
        probe.join(F.broadcast(keys), probe["v"] == keys["v"], "leftsemi"),
    )
    timed(
        "shuffle_semi_join(2M probes, 1M keys)",
        probe.join(
            keys.hint("shuffle_hash"), probe["v"] == keys["v"], "leftsemi"
        ),
    )

    # --- PQ / IVFADC over a replicated vector corpus (2k -> 80k:
    # each replica jittered by a deterministic per-replica offset so
    # codes vary; replicas stay near their source -> clusterable)
    from qualityassurancetool_spark.operators.pq import (
        ivfadc_fit,
        ivfadc_index,
        ivfadc_topk,
        pq_encode,
        pq_fit,
        pq_topk,
    )
    from qualityassurancetool_spark.schema import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    reps = spark.range(40).select(F.col("id").alias("_rep"))
    big = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") * 40 + F.col("_rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x + (F.col("_rep") % 7).cast("double") * 0.003,
            ).alias("embedding"),
        )
        .persist()
    )
    nvec = big.count()
    print(f"# vectors: {nvec}")
    t0 = time.monotonic()
    books = pq_fit(big, m=4, k=16, max_iter=3)
    print(f"# pq_fit(m=4,k=16): {time.monotonic() - t0:.2f}s")
    coded = pq_encode(big, books, strategy="gemm").persist()
    t0 = time.monotonic(); coded.count()
    print(f"# pq_encode({nvec}): {time.monotonic() - t0:.2f}s")
    pqq = big.where(F.col("vec_id") % 10000 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed("pq_topk(flat ADC)", pq_topk(coded, pqq, books, k=10))
    t0 = time.monotonic()
    cents, rbooks = ivfadc_fit(big, n_lists=16, m=4, k=16, max_iter=3)
    print(f"# ivfadc_fit(16 lists): {time.monotonic() - t0:.2f}s")
    index = ivfadc_index(big, cents, rbooks, strategy="gemm").persist()
    t0 = time.monotonic(); index.count()
    print(f"# ivfadc_index({nvec}): {time.monotonic() - t0:.2f}s")
    timed(
        "ivfadc_topk(nprobe=2/16)",
        ivfadc_topk(index, pqq, cents, rbooks, k=10, nprobe=2),
    )

    # --- report + snapshot diff over the replicated corpus
    timed("corpus_report", corpus_report(docs))
    new = docs.where(F.col("doc_id") % 10 != 0)
    timed("snapshot_diff", snapshot_diff(docs, new))

    spark.stop()


if __name__ == "__main__":
    main()

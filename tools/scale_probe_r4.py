"""Scale probe for the second round-3 operator batch: winnowing
fingerprints, ExactSubstr span dedup, hashed linear classifier, and
SemDeDup, at 100k-doc / 10k-vector scale (fast hash modes — the
production path; portable md5 exists for the oracles).

Replication trick matches scale_probe_r3: documents are replicated n×
with an id-salted suffix, so every replica shares almost all of its
windows/fingerprints with its siblings — a worst-case duplication
profile for the dedup operators (≈ n duplicates of everything).

Usage: python tools/scale_probe_r4.py [n_replicas]  (default 20 →
100k docs at sf0.1)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.classifier import (
    score_linear,
    train_log_odds,
)
from qualityassurancetool_spark.operators.clustering import semantic_dedup
from qualityassurancetool_spark.operators.fingerprint import (
    fingerprint_overlap_pairs,
)
from qualityassurancetool_spark.operators.span_dedup import (
    duplicated_span_dedup,
)
from qualityassurancetool_spark.schema import load_table
from qualityassurancetool_spark.session import get_spark
from scale_probe_r3 import replicated_docs


def timed(label, df):
    """Force the FULL plan: a bare count() lets Catalyst prune the
    expensive columns (and even eliminate a left join whose right side
    is unique) — aggregate over every column instead."""
    t0 = time.monotonic()
    agg = [F.count(F.lit(1)).alias("n")] + [
        F.count(c).alias(f"c{i}") for i, c in enumerate(df.columns)
    ]
    n = df.agg(*agg).collect()[0]["n"]
    dt = time.monotonic() - t0
    print(f"# {label}: {dt:.2f}s rows={n}")
    return dt


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-r4")
    spark.sparkContext.setLogLevel("ERROR")

    docs = replicated_docs(spark, sf_dir, n).persist()
    n_docs = docs.count()
    print(f"# corpus: {n_docs} docs")

    # winnowing: max_df must exceed the replica count or every
    # fingerprint is "boilerplate" by construction
    timed(
        "fingerprint_overlap_pairs (fast, k=20 w=8, min_shared=25)",
        fingerprint_overlap_pairs(
            docs, k=20, w=8, max_df=2 * n, min_shared=25, hash_mode="fast"
        ),
    )
    timed(
        "duplicated_span_dedup (fast, L=20)",
        duplicated_span_dedup(docs, window_tokens=20, hash_mode="fast"),
    )

    t0 = time.monotonic()
    labeled = docs.withColumn("label", F.col("lang") == "en")
    w, b = train_log_odds(
        labeled, n_buckets=4096, hash_mode="fast"
    )
    print(f"# classifier train (4096 buckets): {time.monotonic()-t0:.2f}s")
    timed(
        "classifier score",
        score_linear(docs, w, b, hash_mode="fast"),
    )
    t0 = time.monotonic()
    from qualityassurancetool_spark.operators.quality_filters import (
        compression_ratios,
    )

    timed("compression_ratios (zlib mapInPandas)", compression_ratios(docs))

    import shutil
    import tempfile

    from qualityassurancetool_spark.sources.webdataset import (
        write_webdataset_shards,
    )

    tmp = tempfile.mkdtemp(prefix="wds_probe")
    try:
        t0 = time.monotonic()
        man = write_webdataset_shards(
            docs.withColumnRenamed("lang", "l"), tmp, n_shards=32,
            meta_cols=("l",),
        )
        total = sum(r["n_bytes"] for r in man.collect())
        print(
            f"# webdataset write (32 shards): {time.monotonic()-t0:.2f}s "
            f"bytes={total}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    docs.unpersist()

    emb = load_table(spark, sf_dir, "embeddings")
    reps = spark.range(4).select(F.col("id").alias("rep"))
    big_emb = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") * 4 + F.col("rep")).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x: x * (F.lit(1.0) + F.col("rep") / F.lit(100.0)),
            ).alias("embedding"),
        )
        .persist()
    )
    n_vec = big_emb.count()
    t0 = time.monotonic()
    out = semantic_dedup(big_emb, k=16, max_iter=3, threshold=0.99)
    kept = out.filter(F.col("kept")).count()
    print(
        f"# semantic_dedup ({n_vec} vecs, k=16, 3 iters): "
        f"{time.monotonic()-t0:.2f}s kept={kept}"
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale probe for the round-3 operators beyond bench scale: replicate
the documents table n× with id-salted mutations (same trick as
scale_probe_ops) and time

1. char-LM train + score (the trigram explode is the big fan-out:
   ~doc_len rows per doc cross the broadcast join);
2. token vocabulary + per-doc OOV;
3. mixture build (should stay scan-bound: membership is row-local).

Usage: python tools/scale_probe_r3.py [n_replicas]  (default 20 →
100k docs at sf0.1)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.lm_score import (
    score_documents,
    train_char_lm,
)
from qualityassurancetool_spark.operators.mixing import mix_corpora
from qualityassurancetool_spark.operators.vocab import (
    oov_stats,
    token_vocabulary,
)
from qualityassurancetool_spark.schema import load_table
from qualityassurancetool_spark.session import get_spark


def replicated_docs(spark, sf_dir: str, n: int):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    reps = spark.range(n).select(F.col("id").alias("rep"))
    return (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
            # id-salted suffix so replicas aren't byte-identical
            F.concat(
                F.col("text"), F.lit(" rep "), F.col("rep").cast("string")
            ).alias("text"),
            "lang",
        )
    )


def timed(label: str, fn) -> None:
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s ({out} rows)")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-r3")
    spark.sparkContext.setLogLevel("ERROR")
    docs = replicated_docs(spark, sf_dir, n).persist()
    n_docs = docs.count()
    print(f"docs: {n_docs}")

    lm = train_char_lm(docs.where(F.col("lang") == "en"), max_grams=100_000)
    lm.grams.persist().count()
    timed("lm_train (agg only, en slice)", lambda: lm.grams.count())
    timed(
        "lm_score all docs",
        lambda: score_documents(docs, lm).count(),
    )

    vocab = token_vocabulary(docs, top_k=10_000)
    vocab.persist().count()
    timed("vocab top-10k", lambda: vocab.count())
    timed("oov_stats all docs", lambda: oov_stats(docs, vocab).count())

    timed(
        "mixture build (en 1.4 / other 0.6)",
        lambda: mix_corpora(
            {
                "en": docs.where(F.col("lang") == "en"),
                "other": docs.where(F.col("lang") != "en"),
            },
            {"en": 1.4, "other": 0.6},
        ).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Token-frequency vocabulary building and OOV statistics.

The tokenizer-prep half of a training-data pipeline: one corpus pass
builds the top-k token vocabulary (with coverage mass), a second
(cheap, broadcast) pass reports per-doc out-of-vocabulary rates —
the signal mixture builders use to spot under-tokenized sources.

Scale shape: token counting is the canonical map-side-combinable
aggregation (explode → groupBy(token).count() runs partial aggs before
the single shuffle on the token key); the vocabulary itself is top-k —
driver-bounded by construction — and rides a broadcast join back onto
the corpus, so the second pass never shuffles the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import tokens


def token_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(token, n)`` global counts — normalized whitespace tokens,
    empty docs contribute nothing."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    return (
        toks.where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def token_vocabulary(
    df: DataFrame, top_k: int = 1000, text_col: str = "text"
) -> DataFrame:
    """Top-k tokens by count with rank and cumulative coverage of the
    token mass.  Deterministic tie-break on the token string; output is
    ``(token, n, rank, coverage)`` with rank 1 = most frequent.

    top-k of an unbounded token space is the one place a naive plan
    collects the whole distribution: this uses a single ``orderBy``
    +limit over the (already small) count table — Spark's TakeOrdered
    keeps only k rows per partition.
    """
    counts = token_counts(df, text_col)
    top = counts.orderBy(F.desc("n"), "token").limit(top_k)
    w = Window.orderBy(F.desc("n"), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = counts.agg(F.sum("n")).head()[0] or 1
    return top.select(
        "token",
        "n",
        F.row_number()
        .over(Window.orderBy(F.desc("n"), "token"))
        .alias("rank"),
        (F.sum("n").over(w) / F.lit(float(total))).alias("coverage"),
    )


def oov_stats(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc token count, OOV token count, and OOV rate against a
    vocabulary (``token`` column).  The vocabulary is broadcast (top-k
    bounded), the corpus explodes once and never shuffles on a wide key:
    the join key is the token, but the aggregation key is the doc id the
    row already carries, so partial aggs collapse the explosion
    map-side."""
    exploded = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.length("token") > 0)
    marked = exploded.join(
        F.broadcast(vocab.select("token", F.lit(True).alias("_inv"))),
        "token",
        "left",
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0)).alias(
            "n_oov"
        ),
        (
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("oov_rate"),
    )

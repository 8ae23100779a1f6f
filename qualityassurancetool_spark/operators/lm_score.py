"""Character n-gram language-model scoring (CCNet-style quality proxy).

The perplexity filter of pretraining pipelines (CCNet; Wenzek et al.
2020 use a KenLM 5-gram): score each document by its mean log-probability
under a small LM trained on trusted in-language text, drop the worst
tail.  A full KenLM is a binary dependency; this is the dependency-free
equivalent — an add-k smoothed **character trigram** model — that keeps
the two properties the filter actually relies on: (1) fluent in-language
text scores high, (2) gibberish / wrong-language / boilerplate scores
low.

Everything is DataFrame-native, no Python kernels:

- **train** = one explode + one groupBy over the reference slice;
  the model is top-M trigrams + their bigram-context totals — bounded,
  broadcastable;
- **score** = explode docs into trigrams (row-local ``sequence`` +
  ``substring``), broadcast-join the model, mean log-prob per doc.
  Rows of one doc stay in their partition, so the per-doc mean
  collapses map-side before the one shuffle on doc id.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import normalize_text


def _explode_trigrams(df: DataFrame, text_col: str, keep: list[str]):
    """``keep`` columns + one exploded ``gram`` row per character trigram
    of the normalized text (docs shorter than 3 chars yield no rows).

    The normalized text is materialized behind a Generate barrier BEFORE
    the per-trigram lambda touches it: higher-order functions get no
    common-subexpression elimination, so an inlined ``normalize_text``
    tree would re-run its regexp once per trigram per row."""
    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
    )

    normed = compute_behind_barrier(
        df.select(*keep, text_col)
        if text_col not in keep
        else df.select(*keep),
        {"_lmnorm": normalize_text(F.col(text_col))},
    )
    n = F.col("_lmnorm")
    grams = F.when(
        F.length(n) < 3, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(n) - 2),
            lambda i: n.substr(i, F.lit(3)),
        )
    )
    return normed.select(*keep, F.explode(grams).alias("gram"))


@dataclass
class CharLM:
    """Broadcastable char-trigram model: ``grams`` = (gram, n_gram,
    n_context) rows, ``alphabet`` = distinct-char count (the add-k
    denominator), ``k`` = smoothing mass."""

    grams: DataFrame
    alphabet: int
    k: float = 1.0

    def floor_logp(self) -> float:
        """Log-prob assigned to an unseen trigram in an unseen context:
        log(k / (k * alphabet)) — the smoothing floor."""
        return math.log(1.0 / self.alphabet)


def train_char_lm(
    df: DataFrame,
    text_col: str = "text",
    max_grams: int = 100_000,
    k: float = 1.0,
) -> CharLM:
    """One aggregation pass over the reference corpus → bounded model.

    ``n_context`` is the total count of the trigram's 2-char prefix
    (aggregated BEFORE the top-M cut, so probabilities stay properly
    normalized even for truncated tails)."""
    tri = _explode_trigrams(df, text_col, keep=[])
    gcounts = tri.groupBy("gram").agg(F.count(F.lit(1)).alias("n_gram"))
    ctx = (
        gcounts.groupBy(F.substring("gram", 1, 2).alias("_ctx"))
        .agg(F.sum("n_gram").alias("n_context"))
    )
    top = (
        gcounts.orderBy(F.desc("n_gram"), "gram")
        .limit(max_grams)
        .withColumn("_ctx", F.substring("gram", 1, 2))
        .join(ctx, "_ctx")
        .select("gram", "n_gram", "n_context")
    )
    alphabet = (
        df.select(
            F.explode(F.split(normalize_text(F.col(text_col)), "")).alias(
                "ch"
            )
        )
        .where(F.length("ch") > 0)
        .agg(F.countDistinct("ch"))
        .head()[0]
        or 1
    )
    return CharLM(grams=top, alphabet=int(alphabet), k=float(k))


def score_documents(
    df: DataFrame,
    lm: CharLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "lm_logp",
) -> DataFrame:
    """Per-doc mean trigram log-prob: ``(id, n_grams, lm_logp)``.

    Unseen trigrams fall back to the add-k floor; documents with no
    trigrams (< 3 chars) score the floor exactly — rankable, never
    null.  The model join is an explicit broadcast."""
    a, k = float(lm.alphabet), lm.k
    exploded = _explode_trigrams(df, text_col, keep=[id_col])
    joined = exploded.join(F.broadcast(lm.grams), "gram", "left")
    logp = F.log(
        (F.coalesce(F.col("n_gram"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("n_context"), F.lit(0)) + F.lit(k * a))
    )
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.avg(logp).alias(out_col),
    )
    # docs too short to produce trigrams: re-attach with the floor score
    shorts = (
        df.select(id_col)
        .join(scored.select(id_col), id_col, "left_anti")
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_grams"),
            F.lit(lm.floor_logp()).alias(out_col),
        )
    )
    return scored.unionByName(shorts)


def lm_threshold_for_quantile(
    scores: DataFrame, keep_fraction: float, score_col: str = "lm_logp"
) -> float:
    """The CCNet-style cut: the threshold that keeps the best
    ``keep_fraction`` of documents by LM score (CCNet keeps the
    "head"+"middle" perplexity tertiles).  Exact interpolated percentile
    over the (small) score column — one aggregation, a single scalar to
    the driver."""
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction must be in (0, 1], got {keep_fraction}")
    q = 1.0 - keep_fraction
    return float(
        scores.agg(
            F.percentile(F.col(score_col), F.lit(q)).alias("t")
        ).head()["t"]
    )


def lm_filter(
    df: DataFrame,
    lm: CharLM,
    min_logp: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents scoring above the log-prob threshold (the CCNet
    "head+middle" cut is a per-corpus quantile of this score)."""
    scores = score_documents(df, lm, text_col=text_col, id_col=id_col)
    return df.join(
        scores.where(F.col("lm_logp") >= min_logp).select(id_col),
        id_col,
        "left_semi",
    )

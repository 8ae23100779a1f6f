"""Interpolated Kneser-Ney bigram language model — the scorer family
CCNet actually ships (KenLM is KN-smoothed; the char-trigram add-k
model in ``operators/lm_score`` is its cheap cousin).  Word-level,
absolute discounting d, continuation-probability backoff:

    P(w2|w1) = max(c(w1,w2) - d, 0) / c(w1)
             + d * N1+(w1*) / c(w1) * Pcont(w2)          (seen context)
    P(w2|w1) = Pcont(w2)                                  (unseen w1)
    Pcont(w2) = (N1+(*w2) + k) / (T + k * V)              (add-k floor)

where N1+(w1*) = distinct followers of w1, N1+(*w2) = distinct
predecessors of w2, T = distinct bigram types, V = vocabulary size.
The add-k floor on the continuation distribution keeps unseen words
scoreable (classic KN assigns them zero) — deterministic, integer-
derived, and exactly reproducible in ANSI SQL for the oracle.

Spark shape (mirrors lm_score): training is TWO aggregations over the
reference slice's bigram explode (bigram counts; the context /
continuation stats derive from the first by two more groupBys —
all map-side combinable).  Scoring explodes each document's bigram
positions behind a Generate barrier and broadcast-joins the model
tables.  Like the char LM, train on a bounded reference slice so the
model broadcast stays model-sized, not corpus-sized; documents with
fewer than 2 tokens score the floor ``log(k / (T + k*V))`` exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import log

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import normalize_text
from qualityassurancetool_spark.functions.partitioning import (
    compute_behind_barrier,
)


def _doc_bigrams(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    """(keep..., w1, w2) rows — one per bigram position, barrier-staged."""
    normed = compute_behind_barrier(
        df.select(*[F.col(c) for c in keep], F.col(text_col)),
        {"_norm": normalize_text(F.col(text_col))},
    )
    toked = compute_behind_barrier(
        normed.select(*keep, "_norm"),
        {
            "_t": F.when(
                F.length("_norm") == 0, F.array().cast("array<string>")
            ).otherwise(F.split(F.col("_norm"), " "))
        },
    )
    toks = F.col("_t")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return toked.select(*keep, F.explode(pairs).alias("bg")).select(
        *keep, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


@dataclass
class KNModel:
    bigrams: DataFrame      # (w1, w2, c)
    contexts: DataFrame     # (w1, c1, n_follow)
    continuation: DataFrame # (w2, n_prec)
    n_types: int            # T
    vocab: int              # V
    discount: float
    k: float

    @property
    def floor_logp(self) -> float:
        return log(self.k / (self.n_types + self.k * self.vocab))


def train_kn_bigram(
    ref: DataFrame,
    text_col: str = "text",
    discount: float = 0.75,
    k: float = 0.5,
) -> KNModel:
    """Fit the KN stats on a reference slice.  Three groupBys, all
    derived from one bigram explode; the two scalar totals (T, V) are
    single-row aggregations."""
    bg = _doc_bigrams(ref, text_col, []).persist()
    bigrams = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    bigrams = bigrams.persist()
    contexts = bigrams.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n_follow")
    )
    continuation = bigrams.groupBy("w2").agg(
        F.count(F.lit(1)).alias("n_prec")
    )
    n_types = bigrams.count()
    vocab = (
        bg.select(F.col("w1").alias("w"))
        .unionByName(bg.select(F.col("w2").alias("w")))
        .distinct()
        .count()
    )
    return KNModel(
        bigrams, contexts, continuation, n_types, vocab, discount, k
    )


def score_kn(
    model: KNModel,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, kn_logp): mean log KN probability per document;
    documents with no bigrams score the floor exactly (never null)."""
    T, V = model.n_types, model.vocab
    d, k = model.discount, model.k
    bg = _doc_bigrams(df, text_col, [id_col])
    joined = (
        bg.join(F.broadcast(model.bigrams), ["w1", "w2"], "left")
        .join(F.broadcast(model.contexts), "w1", "left")
        .join(F.broadcast(model.continuation), "w2", "left")
    )
    pcont = (F.coalesce(F.col("n_prec"), F.lit(0)) + F.lit(k)) / F.lit(
        T + k * V
    )
    seen_ctx = F.col("c1").isNotNull()
    p = F.when(
        seen_ctx,
        F.greatest(
            F.coalesce(F.col("c"), F.lit(0)) - F.lit(d), F.lit(0.0)
        )
        / F.col("c1")
        + F.lit(d) * F.col("n_follow") / F.col("c1") * pcont,
    ).otherwise(pcont)
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg(F.log(p)).alias("kn_logp"),
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(
                F.col("kn_logp"), F.lit(model.floor_logp)
            ).alias("kn_logp"),
        )
    )

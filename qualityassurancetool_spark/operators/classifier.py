"""fastText-style hashed linear classifier for document scoring.

The standard quality/language gate in large corpus pipelines (CCNet,
fastText supervised) is a linear model over hashed bag-of-ngram
features.  This module provides the Spark-first version:

 - features: word unigrams + bigrams, feature-hashed into
   ``n_buckets`` (portable md5 for oracle checkability, ``xxhash64``
   fast mode for production — the dedup-family convention);
 - training: per-bucket add-k-smoothed log-odds from a boolean label —
   ONE explode + groupBy(bucket) aggregation (bounded at n_buckets
   rows, collected to a driver weight vector like IVF centroids);
 - scoring: ``score = bias + mean(w[bucket(f)])`` per document with a
   sigmoid on top, computed as a row-local sequential fold over the
   feature array against a single JSON weight literal
   (functions/literals.py) — NO join, NO shuffle, no Python stage.

This is Berkson's naive-Bayes-as-linear-model: per-bucket weights are
``ln P(b|pos) − ln P(b|neg)`` with add-k smoothing, the bias is the
class prior log-odds.  It is not SGD-fitted fastText, but it has the
same serving shape — swap the weight vector for an externally trained
one and the scoring plan is unchanged.

Scale: training shuffles (bucket, is_pos) pairs — 8-byte keys,
map-side combined; n_buckets rows collect to the driver (4096 doubles
= 32 KB).  Scoring is embarrassingly parallel.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import (
    md5_long,
    normalize_text,
)
from qualityassurancetool_spark.functions.literals import (
    double_array_literal,
)

N_BUCKETS = 4096


def hashed_ngram_buckets(
    toks: Column, n_buckets: int = N_BUCKETS, hash_mode: str = "portable"
) -> Column:
    """Bucket ids (array<long>, with repeats — occurrence counts matter)
    for word unigrams + bigrams of a materialized token array.
    ``toks`` must be an attribute (CSE contract, functions/hashing.py);
    pass an empty array for empty documents."""
    h = (
        (lambda c: md5_long(c) % n_buckets)
        if hash_mode == "portable"
        else (lambda c: F.pmod(F.xxhash64(c), F.lit(n_buckets)))
    )
    n = F.size(toks)
    uni = F.transform(toks, lambda t: h(t))
    bi = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: h(
                F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                )
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return F.concat(uni, bi)


def _tokens_or_empty(norm: Column) -> Column:
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def _features(df: DataFrame, text_col: str, id_col: str, extra: list[str],
              n_buckets: int, hash_mode: str) -> DataFrame:
    # Generate barriers between stages: CollapseProject would inline
    # _norm into the tokenizer and _toks into every per-feature lambda
    # (one split/regexp evaluation PER FEATURE — measured 250s -> 3s
    # for training on the 100k-doc probe)
    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
    )

    normed = compute_behind_barrier(
        df.select(F.col(id_col), *extra, F.col(text_col)),
        {"_norm": normalize_text(F.col(text_col))},
    )
    toked = compute_behind_barrier(
        normed.select(id_col, *extra, "_norm"),
        {"_toks": _tokens_or_empty(F.col("_norm"))},
    )
    return toked.select(
        id_col,
        *extra,
        hashed_ngram_buckets(F.col("_toks"), n_buckets, hash_mode).alias(
            "_buckets"
        ),
    )


def train_log_odds(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    smoothing: float = 1.0,
    hash_mode: str = "portable",
) -> tuple[list[float], float]:
    """(weights, bias): add-k log-odds per bucket + class-prior bias.
    ``label_col`` must be boolean (positive class = true)."""
    feats = _features(
        df.select(id_col, text_col, F.col(label_col).alias("_y")),
        text_col, id_col, ["_y"], n_buckets, hash_mode,
    )
    exploded = feats.select(
        "_y", F.explode("_buckets").alias("bucket")
    )
    counts = exploded.groupBy("bucket").agg(
        F.sum(F.col("_y").cast("long")).alias("pos"),
        F.count(F.lit(1)).alias("tot"),
    ).collect()
    pos_b = {r["bucket"]: r["pos"] for r in counts}
    tot_b = {r["bucket"]: r["tot"] for r in counts}
    pos_total = sum(pos_b.values())
    neg_total = sum(tot_b.values()) - pos_total
    s = smoothing
    weights = []
    for b in range(n_buckets):
        p = pos_b.get(b, 0)
        q = tot_b.get(b, 0) - p
        weights.append(
            math.log((p + s) / (pos_total + s * n_buckets))
            - math.log((q + s) / (neg_total + s * n_buckets))
        )
    doc_counts = df.select(
        F.sum(F.col(label_col).cast("long")).alias("p"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n_pos, n_all = doc_counts["p"] or 0, doc_counts["n"]
    bias = math.log((n_pos + s) / (n_all - n_pos + s))
    return weights, bias


def score_linear(
    df: DataFrame,
    weights: list[float],
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    hash_mode: str = "portable",
) -> DataFrame:
    """(id, n_features, score, prob): mean bucket weight + bias through
    a sigmoid.  Row-local sequential fold against one JSON weight
    literal; docs with no features score the bare bias."""
    nb = n_buckets or len(weights)
    if nb != len(weights):
        raise ValueError("n_buckets must equal len(weights)")
    feats = _features(df, text_col, id_col, [], nb, hash_mode)
    w = double_array_literal(tuple(float(x) for x in weights))
    buckets = F.col("_buckets")
    n = F.size(buckets)
    total = F.aggregate(
        buckets,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(w, (b + 1).cast("int")),
    )
    score = F.when(n > 0, F.lit(float(bias)) + total / n).otherwise(
        F.lit(float(bias))
    )
    return feats.select(
        F.col(id_col),
        n.cast("long").alias("n_features"),
        score.alias("score"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-score))).alias("prob"),
    )

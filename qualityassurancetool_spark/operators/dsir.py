"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, "Data Selection for Language Models via Importance
Resampling"): pick raw-corpus documents that look like a small target
corpus by (1) hashing n-gram features into a fixed bucket space,
(2) fitting bag-of-buckets unigram models for target and raw, and
(3) resampling raw docs with weight ∝ p_target(doc)/p_raw(doc) using
Gumbel top-k (sampling without replacement).

Scale design (100 TB raw corpus, small target):
 - feature extraction is row-local (normalize → tokens → uni+bigram →
   md5 bucket), with the same Generate-barrier discipline as the other
   text operators (token array materialized in its own projection);
 - fitting is ONE aggregation per corpus: explode per-doc bucket arrays
   map-side, partial-agg counts, and collect at most ``n_buckets`` rows
   (the bucket space is a few thousand by construction — the paper uses
   10k hashed buckets — so the driver table is KBs, a documented bound
   like the IVF centroid collect);
 - the fitted log-ratio vector ships to every scoring row as ONE array
   literal (``functions.literals``) — scoring is a zero-shuffle fold,
   no join against a weight table;
 - selection is deterministic Gumbel top-k: the Gumbel noise comes from
   an md5 uniform (no ``rand()``, reproducible across runs/retries) and
   the global top-k is ``orderBy(...).limit(k)`` → TakeOrdered
   (per-partition top-k + driver k-merge, never a full sort).

Everything is md5-based and therefore bit-reproducible in any SQL
engine — the full fit→score→select chain has a DuckDB oracle
(``tools/extra_oracles.py::x_dsir``).

Reference scope note: the reference QC tool has no data-selection
surface; this operator belongs to the beyond-reference training-data
family (SURVEY §2b/2c).
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
from qualityassurancetool_spark.functions.partitioning import (
    compute_behind_barrier,
)

BUCKET_SALT = "dsir:"
GUMBEL_SALT = "dsir-g:"
# (h + 1) / _U_DEN maps the 60-bit md5 int onto (0, 1) exclusive — both
# endpoints excluded so -ln(-ln(u)) is always finite.  The decimal
# literal parses to the same IEEE double in every engine.
_U_DEN = 1152921504606846978.0  # 2^60 + 2 (nearest double)

# Driver-side bound on the bucket space: the log-ratio vector is
# collected and shipped as one literal (8 B/bucket → 512 KB at the cap).
MAX_BUCKETS = 65536


def _clean_tokens(text: Column) -> Column:
    """Normalized whitespace tokens with empties dropped (empty text
    would otherwise contribute a single '' token)."""
    return F.filter(
        F.split(normalize_text(text), " "), lambda t: F.length(t) > 0
    )


def feature_buckets(
    toks: Column,
    n_buckets: int,
    salt: str = BUCKET_SALT,
    hash_mode: str = "portable",
) -> Column:
    """Hashed uni+bigram bag (WITH multiplicity, per the paper's
    bag-of-hashed-ngrams model) → ``array<long>`` of bucket ids in
    ``[0, n_buckets)``.

    ``hash_mode="portable"`` (default) buckets via md5 — bit-identical
    in DuckDB, the oracle mode.  ``"fast"`` uses engine-native
    xxhash64 (~2.5× extraction; the production path, same convention
    as the dedup family).  Fit and score MUST use the same mode.

    ``toks`` must be a materialized attribute (Generate-barrier
    contract shared with ``functions.hashing.shingles_from_tokens``).
    """
    if hash_mode not in ("portable", "fast"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    n = F.size(toks)
    uni = toks
    bi_idx = F.sequence(F.lit(1), n - F.lit(1))
    bi = F.when(
        n >= 2,
        F.transform(
            bi_idx,
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(uni, bi)
    if hash_mode == "fast":
        return F.transform(
            grams,
            lambda g: F.pmod(
                F.xxhash64(F.concat(F.lit(salt), g)), F.lit(n_buckets)
            ),
        )
    return F.transform(
        grams, lambda g: md5_long(g, salt=salt) % F.lit(n_buckets)
    )


def doc_features(
    df: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "portable",
) -> DataFrame:
    """``(id_col, _fb)`` — per-doc feature-bucket array.  Both stages
    sit behind Generate barriers: a bare projection would be
    CollapseProject-inlined, re-running normalize/split once per
    element access — O(tokens²) per row (measured: the barrier cut the
    100k-doc fit from 377 s to 24 s portable / 12.5 s fast)."""
    with_tok = compute_behind_barrier(
        df.select(F.col(id_col), F.col(text_col)),
        {"_tok": _clean_tokens(F.col(text_col))},
    )
    return compute_behind_barrier(
        with_tok,
        {"_fb": feature_buckets(F.col("_tok"), n_buckets,
                                hash_mode=hash_mode)},
    ).select(id_col, "_fb")


def _bucket_counts(feats: DataFrame) -> dict[int, int]:
    """Collect per-bucket feature counts (≤ n_buckets rows — the
    documented driver bound)."""
    pdf = (
        feats.select(F.explode("_fb").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    return {int(r.b): int(r.n) for r in pdf.itertuples()}


def fit_log_ratio(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    smoothing: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "portable",
) -> tuple[float, ...]:
    """Fit per-bucket importance log-ratios
    ``λ_b = ln p_target(b) − ln p_raw(b)`` with add-``smoothing``
    Laplace estimates.  Returns a length-``n_buckets`` tuple (hashable →
    the literal Column is memoized across scoring sites)."""
    if n_buckets > MAX_BUCKETS:
        raise ValueError(
            f"n_buckets={n_buckets} exceeds MAX_BUCKETS={MAX_BUCKETS} "
            "(log-ratio vector is a driver literal)"
        )
    cp = _bucket_counts(
        doc_features(target, n_buckets, text_col, id_col, hash_mode)
    )
    cq = _bucket_counts(
        doc_features(raw, n_buckets, text_col, id_col, hash_mode)
    )
    np_tot = sum(cp.values()) + smoothing * n_buckets
    nq_tot = sum(cq.values()) + smoothing * n_buckets
    return tuple(
        math.log((cp.get(b, 0) + smoothing) / np_tot)
        - math.log((cq.get(b, 0) + smoothing) / nq_tot)
        for b in range(n_buckets)
    )


def importance_scores(
    df: DataFrame,
    log_ratio: tuple[float, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "portable",
) -> DataFrame:
    """Per-doc importance score = Σ_features λ_bucket (zero-feature docs
    score 0.0).  Adds ``n_features`` and ``dsir_score``; row-local —
    the λ vector rides along as one array literal, no join."""
    n_buckets = len(log_ratio)
    lam = double_array_literal(log_ratio)
    feats = doc_features(df, n_buckets, text_col, id_col, hash_mode)
    scored = feats.select(
        id_col,
        F.size("_fb").alias("n_features"),
        F.aggregate(
            "_fb",
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(lam, (b + 1).cast("int")),
        ).alias("dsir_score"),
    )
    return df.join(scored, on=id_col, how="inner")


def gumbel_key(score: Column, id_col: Column, salt: str = GUMBEL_SALT) -> Column:
    """Gumbel-perturbed key: ``score + (-ln(-ln(u)))`` with
    ``u = (md5_60bit(salt||id)+1) / (2^60+2)`` — the Gumbel-max trick
    makes top-k by this key an exact without-replacement sample with
    probabilities ∝ exp(score), deterministically."""
    u = (md5_long(id_col.cast("string"), salt=salt) + F.lit(1)).cast(
        "double"
    ) / F.lit(_U_DEN)
    return score - F.log(-F.log(u))


def dsir_resample(
    df: DataFrame,
    log_ratio: tuple[float, ...],
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = GUMBEL_SALT,
    hash_mode: str = "portable",
) -> DataFrame:
    """Select ``k`` docs by Gumbel top-k over the importance scores.
    Global top-k is TakeOrdered (never a full sort); ties broken by id
    so the selection is total-order deterministic."""
    scored = importance_scores(df, log_ratio, text_col, id_col, hash_mode)
    keyed = scored.withColumn(
        "dsir_key", gumbel_key(F.col("dsir_score"), F.col(id_col), salt)
    )
    return keyed.orderBy(F.desc("dsir_key"), F.col(id_col)).limit(k)

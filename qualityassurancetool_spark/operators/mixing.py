"""Deterministic training-mixture construction across corpus sources.

Mixture weights ("sample source A at 2.3 epochs, B at 0.4") are the
standard knob for composing pretraining data.  This builds the mixture
WITHOUT randomness: per-source sampling uses the md5 uniform variate
(``operators/sampling.uniform_hash``), upsampling (weight > 1) becomes
whole EPOCH copies plus one hash-sampled fractional epoch — each epoch
salted differently so fractional epochs draw different rows — and the
interleave order is itself a hash (``mix_key``), so a sorted write
yields a shuffled-but-reproducible mixture.  Re-runs, task retries, and
any md5-capable engine produce the identical mixture.

Scale shape: pure row-local Column exprs per source (no shuffle to
decide membership), one union, and the final order is delegated to the
writer (sort by ``mix_key`` within output shards — no global sort
required for training-shard consumption).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.sampling import uniform_hash


def mix_corpora(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """Union of per-source samples with epoch expansion.

    ``weights[name]`` = epochs of that source to include (2.4 → two full
    copies + a 0.4 hash-sample).  Output adds ``source`` (name),
    ``epoch`` (0-based copy index) and ``mix_key`` (uniform [0,1) hash of
    (source, epoch, id) — the deterministic interleave order).  Sources
    must share a schema (enforced by ``unionByName``).
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    missing = set(sources) - set(weights)
    if missing:
        raise ValueError(f"missing weights for {sorted(missing)}")
    bad = {n: w for n, w in weights.items() if n in sources and w < 0}
    if bad:
        raise ValueError(f"negative weights: {bad}")

    parts: list[DataFrame] = []
    for name, df in sources.items():
        w = float(weights[name])
        full_epochs = int(math.floor(w))
        frac = w - full_epochs
        for epoch in range(full_epochs):
            parts.append(_epoch_part(df, name, epoch, 1.0, id_col, salt))
        if frac > 0:
            parts.append(
                _epoch_part(df, name, full_epochs, frac, id_col, salt)
            )
    if not parts:
        # all weights zero → empty mixture with the first source's schema
        first = next(iter(sources.items()))
        return _epoch_part(first[1], first[0], 0, 1.0, id_col, salt).where(
            F.lit(False)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _epoch_part(
    df: DataFrame, name: str, epoch: int, frac: float, id_col: str, salt: str
) -> DataFrame:
    esalt = f"{salt}{name}:{epoch}:"
    # null ids are excluded from EVERY epoch, full or fractional: the
    # mixture is a pure function of (salt, id), and a null id has no
    # hash — full epochs used to keep such rows (with a null mix_key
    # that sorts unpredictably) while fractional epochs dropped them,
    # so membership jumped discontinuously with the weight (review
    # finding, round 8)
    part = (
        df.where(F.col(id_col).isNotNull())
        .withColumn("source", F.lit(name))
        .withColumn("epoch", F.lit(epoch))
    )
    if frac < 1.0:
        part = part.where(uniform_hash(F.col(id_col), esalt) < frac)
    return part.withColumn(
        "mix_key", uniform_hash(F.col(id_col), esalt + "k:")
    )


def mixture_report(mixture: DataFrame) -> DataFrame:
    """Per-(source, epoch) row counts — the sanity sheet for a mixture
    build (did the 0.4 fractional epoch land near 40%?)."""
    return (
        mixture.groupBy("source", "epoch")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("source", "epoch")
    )


def temperature_weights(
    sizes: dict[str, float],
    alpha: float = 0.3,
    target_total: float | None = None,
    max_epochs: float | None = None,
) -> dict[str, float]:
    """Epoch weights for :func:`mix_corpora` from TEMPERATURE sampling —
    the multilingual/multi-domain recipe (XLM Lample-Conneau 2019 §3.1,
    mT5 Xue et al. 2021): domain sampling probability
    ``p_d ∝ n_d^alpha``, so low-resource domains are upsampled as
    ``alpha`` drops (``alpha=1`` → natural proportions, ``alpha=0`` →
    uniform across domains).

    ``sizes[name]`` is the domain's size in whatever unit the budget is
    denominated (docs or tokens); ``target_total`` is the mixture's
    budget in the same unit (default: the natural total, i.e. resizing
    only the PROPORTIONS).  Returned ``weights[name]`` = epochs =
    ``p_d * target_total / n_d`` — exactly what ``mix_corpora`` takes,
    so the full recipe is::

        w = temperature_weights({n: df.count() for n, df in srcs.items()})
        mixture = mix_corpora(srcs, w)

    ``max_epochs`` caps upsampling of tiny domains (the standard guard
    against hundreds of repeats memorizing a small source); the clipped
    mass is NOT redistributed — the mixture simply lands under budget,
    which is the transparent behavior (a re-normalizing variant would
    silently shift every other domain's share).

    Driver-side arithmetic on a per-domain dict (domains are metadata-
    scale); the heavy lifting stays in ``mix_corpora``'s row-local
    hash sampling.
    """
    if not sizes:
        raise ValueError("sizes must be non-empty")
    if any(n <= 0 for n in sizes.values()):
        bad = {k: v for k, v in sizes.items() if v <= 0}
        raise ValueError(f"sizes must be positive: {bad}")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    total = float(sum(sizes.values()))
    budget = float(target_total) if target_total is not None else total
    if budget <= 0:
        raise ValueError("target_total must be positive")
    powered = {k: float(v) ** alpha for k, v in sizes.items()}
    z = sum(powered.values())
    weights = {
        k: (powered[k] / z) * budget / float(sizes[k]) for k in sizes
    }
    if max_epochs is not None:
        if max_epochs <= 0:
            raise ValueError("max_epochs must be positive")
        weights = {k: min(w, float(max_epochs)) for k, w in weights.items()}
    return weights


def unimax_weights(
    sizes: dict[str, float],
    target_total: float | None = None,
    max_epochs: float = 4.0,
) -> dict[str, float]:
    """Epoch weights from UNIMAX budget allocation (Chung et al.,
    "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining", ICLR 2023 §3): instead of
    a temperature knob, give every domain an EQUAL share of the
    budget unless that share would exceed its epoch cap — capped
    domains take ``max_epochs`` passes over their data, and their
    unused share is redistributed uniformly over the rest.

    Algorithm (deterministic, closed-form): visit domains in
    ascending capacity ``c_d · N``; at each step the uniform share is
    ``u = remaining_budget / remaining_domains`` and the domain takes
    ``min(u, c_d · N)``.  Once a domain is uncapped every later one
    is too (capacities ascend), so ``u`` freezes — the classic
    water-filling shape.

    Returned ``weights[name]`` = epochs = allocation / size, ready
    for :func:`mix_corpora`.  Driver-side arithmetic over the
    metadata-scale domain dict, same as
    :func:`temperature_weights`."""
    if not sizes:
        raise ValueError("sizes must be non-empty")
    if any(n <= 0 for n in sizes.values()):
        bad = {k: v for k, v in sizes.items() if v <= 0}
        raise ValueError(f"sizes must be positive: {bad}")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be positive")
    total = float(sum(sizes.values()))
    budget = float(target_total) if target_total is not None else total
    if budget <= 0:
        raise ValueError("target_total must be positive")
    # ascending capacity; name tie-break keeps the order deterministic
    order = sorted(sizes, key=lambda k: (float(sizes[k]), k))
    remaining, left = budget, len(order)
    alloc: dict[str, float] = {}
    for name in order:
        cap = float(sizes[name]) * float(max_epochs)
        share = remaining / left
        alloc[name] = min(share, cap)
        remaining -= alloc[name]
        left -= 1
    return {name: alloc[name] / float(sizes[name]) for name in sizes}


def unimax_mixture(
    sources: dict[str, DataFrame],
    target_total: float | None = None,
    max_epochs: float = 4.0,
    id_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """One-stop UniMax mixing: count each source, derive
    :func:`unimax_weights`, build the deterministic mixture via
    :func:`mix_corpora`."""
    sizes = {name: df.count() for name, df in sources.items()}
    w = unimax_weights(sizes, target_total, max_epochs)
    return mix_corpora(sources, w, id_col=id_col, salt=salt)


def temperature_mixture(
    sources: dict[str, DataFrame],
    alpha: float = 0.3,
    target_total: float | None = None,
    max_epochs: float | None = None,
    id_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """One-stop temperature mixing: count each source (one cheap agg
    apiece), derive :func:`temperature_weights`, build the
    deterministic mixture via :func:`mix_corpora`."""
    sizes = {name: df.count() for name, df in sources.items()}
    w = temperature_weights(sizes, alpha, target_total, max_epochs)
    return mix_corpora(sources, w, id_col=id_col, salt=salt)

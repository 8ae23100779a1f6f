"""Broadcast Bloom-filter membership (Bloom 1970; Kirsch–Mitzenmacher
2006 double hashing): build a fixed-size bit set from a key column,
ship it to every executor as ONE array literal, and test membership as
a pure Column — the standard 100 TB pre-filter in front of an exact
join (blocklist screening, decontamination gram pre-check, "seen
before" admission) when the key set is too big to broadcast raw but
its bit signature is not.

Scale design:
 - build is one map-side explode of k positions per key + a partial-agg
   ``bit_or`` per 32-bit word — only (word_idx, word) pairs shuffle,
   and at most ``m_bits/32`` rows are collected (the cap bounds the
   driver/literal size at 8 MB ≈ 2^26 bits ≈ 4.6 M keys at 1 % fpp);
 - probe is ZERO-shuffle: k arithmetic double-hash positions per row,
   each tested against the one ``array<bigint>`` words literal — no
   join, no broadcast-table lookup, whole-stage-codegen friendly;
 - false positives only (never false negatives), so the pattern is
   always ``might_contain`` pre-filter → exact verify join on the
   survivors: the exact join's probe side shrinks from the corpus to
   ~(hits + fpp·corpus).

Hashes are md5-derived (``functions.hashing``) → the whole build+probe
chain is bit-reproducible in DuckDB
(``tools/extra_oracles.py::x_bloom``).

Reference scope note: beyond-reference training-data family (SURVEY
§2b/2c); Spark's own runtime bloom pushdown is join-internal and not
available as a reusable, cross-engine-checkable surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.literals import long_array_literal
from qualityassurancetool_spark.functions.partitioning import (
    compute_behind_barrier,
)

BF_SALT = "bf:"
WORD_BITS = 32  # packed into longs; 32-bit words stay non-negative,
# so the pow(2, b) mask arithmetic is exact and sign-free
MAX_BITS = 1 << 26  # 8 MB literal cap — documented driver/plan bound


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``n_items`` keys at target false-positive
    rate — m rounded up to a whole word."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + WORD_BITS - 1) // WORD_BITS) * WORD_BITS
    k = max(1, round(m / max(n_items, 1) * math.log(2)))
    return m, k


def _hash_pair(col: Column) -> tuple[Column, Column]:
    """(h1, h2) from ONE md5: hex chars 1–15 and 17–31 as two 60-bit
    ints — one hash per row instead of 2k (md5 dominates probe cost;
    the k positions are then integer arithmetic)."""
    hx = F.md5(F.concat(F.lit(BF_SALT), col.cast("string")))
    h1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 17, 15), 16, 10).cast("long")
    return h1, h2


def _positions_from(
    h1: Column, h2: Column, m_bits: int, k: int
) -> list[Column]:
    """k double-hashed bit positions ``(h1 + i*h2) mod m`` (Kirsch–
    Mitzenmacher) with the stride forced ≥ 1 so it never degenerates."""
    p1 = h1 % F.lit(m_bits)
    p2 = h2 % F.lit(m_bits - 1) + 1
    return [(p1 + F.lit(i) * p2) % F.lit(m_bits) for i in range(k)]


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """Inline convenience form (h1/h2 NOT staged — fine inside a single
    Generate/explode, see build_bloom; probe hot paths use
    ``with_might_contain`` which stages them behind a barrier)."""
    h1, h2 = _hash_pair(col)
    return _positions_from(h1, h2, m_bits, k)


def build_bloom(
    df: DataFrame, col: str, m_bits: int, k: int
) -> tuple[int, ...]:
    """Aggregate the key column into a packed word vector
    (``m_bits/32`` longs, tuple → memoizable literal).  One explode +
    one ``bit_or`` shuffle of (word, mask) pairs; collect is bounded by
    the word count, not the key count."""
    if m_bits > MAX_BITS:
        raise ValueError(f"m_bits={m_bits} exceeds MAX_BITS={MAX_BITS}")
    if m_bits % WORD_BITS:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    h1, h2 = _hash_pair(F.col(col))
    staged = compute_behind_barrier(
        df.select(F.col(col)), {"_h1": h1, "_h2": h2}
    )
    pos = F.explode(
        F.array(
            *_positions_from(F.col("_h1"), F.col("_h2"), m_bits, k)
        )
    ).alias("p")
    words = (
        staged.select(pos)
        .select(
            (F.col("p") / WORD_BITS).cast("long").alias("w"),
            F.pow(F.lit(2.0), (F.col("p") % WORD_BITS).cast("double"))
            .cast("long")
            .alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    vec = [0] * (m_bits // WORD_BITS)
    for r in words:
        vec[int(r["w"])] = int(r["bits"])
    return tuple(vec)


def _bit_tests(
    h1: Column, h2: Column, words: tuple[int, ...], k: int
) -> Column:
    """AND of the k bit probes as ONE ``aggregate`` fold over the
    position array, so the (potentially multi-MB) words literal appears
    exactly ONCE in the plan.  An unrolled k-conjunct chain embeds k
    copies of the literal — and plan stringification (codegen comments,
    AQE plan-description updates) is linear in plan text, which made
    the unrolled form ~10× slower in DRIVER time (13.8 s → 1.4 s at
    m=9.6 M bits, measured independent of row count)."""
    m_bits = len(words) * WORD_BITS
    lit = long_array_literal(words)
    pos = F.array(*_positions_from(h1, h2, m_bits, k))
    return F.aggregate(
        pos,
        F.lit(True),
        lambda acc, p: acc
        & (
            F.element_at(lit, (p / WORD_BITS).cast("int") + 1).bitwiseAND(
                F.pow(F.lit(2.0), (p % WORD_BITS).cast("double")).cast(
                    "long"
                )
            )
            != 0
        ),
    )


def might_contain(
    col: Column, words: tuple[int, ...], k: int
) -> Column:
    """Pure-Column Bloom probe: true ⇒ possibly inserted, false ⇒
    definitely absent.  Composable form — inside a bare Filter the
    shared md5 may evaluate up to 2k times (no substitution barrier);
    hot paths should use :func:`with_might_contain`, which stages the
    hash pair once per row (measured 5× at 2 M probes)."""
    h1, h2 = _hash_pair(col)
    return _bit_tests(h1, h2, words, k)


def with_might_contain(
    df: DataFrame,
    probe_col: str,
    words: tuple[int, ...],
    k: int,
    out_col: str = "might",
) -> DataFrame:
    """Staged Bloom probe: the md5 hex is computed exactly once per row
    behind a Generate barrier, and the boolean itself sits behind a
    second barrier — a downstream ``where(out_col)`` then carries only
    an attribute reference, keeping the words literal out of the Filter
    predicate (Filter predicates are re-stringified by AQE plan
    updates).  Zero shuffle, no join."""
    hx = F.md5(F.concat(F.lit(BF_SALT), F.col(probe_col).cast("string")))
    staged = compute_behind_barrier(df, {"_bf_hx": hx})
    h1 = F.conv(F.substring("_bf_hx", 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring("_bf_hx", 17, 15), 16, 10).cast("long")
    out = compute_behind_barrier(
        staged, {out_col: _bit_tests(h1, h2, words, k)}
    )
    return out.drop("_bf_hx")


def bloom_prefilter(
    probe: DataFrame,
    keys: DataFrame,
    probe_col: str,
    key_col: str | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """The canonical composition: fit (m, k) to the key count, build,
    and keep only probe rows whose value might be in ``keys`` — the
    cheap screen before an exact semi/anti join.  Returns the filtered
    probe frame (false positives included by construction; follow with
    the exact join for exactness)."""
    key_col = key_col or probe_col
    n = keys.select(key_col).distinct().count()
    m_bits, k = bloom_parameters(max(n, 1), fpp)
    words = build_bloom(keys.select(key_col).distinct(), key_col, m_bits, k)
    return (
        with_might_contain(probe, probe_col, words, k, out_col="_might")
        .where(F.col("_might"))
        .drop("_might")
    )

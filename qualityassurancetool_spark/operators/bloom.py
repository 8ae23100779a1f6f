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

from qualityassurancetool_spark.functions.hashing import md5_long
from qualityassurancetool_spark.functions.literals import long_array_literal

H1_SALT = "bf1:"
H2_SALT = "bf2:"
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


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k double-hashed bit positions: ``(h1 + i*h2) mod m`` with h2
    forced odd-ranged ≥ 1 so strides never degenerate."""
    h1 = md5_long(col.cast("string"), salt=H1_SALT) % F.lit(m_bits)
    h2 = md5_long(col.cast("string"), salt=H2_SALT) % F.lit(m_bits - 1) + 1
    return [(h1 + F.lit(i) * h2) % F.lit(m_bits) for i in range(k)]


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
    pos = F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("p")
    words = (
        df.select(pos)
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


def might_contain(
    col: Column, words: tuple[int, ...], k: int
) -> Column:
    """Pure-Column Bloom probe: true ⇒ possibly inserted, false ⇒
    definitely absent.  k word lookups against the single array
    literal — zero shuffle, no join."""
    m_bits = len(words) * WORD_BITS
    lit = long_array_literal(words)
    out = F.lit(True)
    for p in _positions(col, m_bits, k):
        word = F.element_at(lit, (p / WORD_BITS).cast("int") + 1)
        mask = F.pow(F.lit(2.0), (p % WORD_BITS).cast("double")).cast("long")
        out = out & (word.bitwiseAND(mask) != 0)
    return out


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
    return probe.where(might_contain(F.col(probe_col), words, k))

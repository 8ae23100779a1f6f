"""Portable deterministic hashing for dedup / fingerprint operators.

Engine-specific hashes (Spark ``xxhash64`` vs DuckDB ``hash``) differ, so
cross-engine-checkable operators hash via **md5** (identical everywhere) and
derive integers from hex prefixes.  ``md5_long`` yields a 60-bit
non-negative integer (15 hex chars → fits a signed 64-bit long in any
engine).  Where cross-engine parity is not needed (pure-Spark hot paths),
prefer ``xxhash64`` — it is considerably faster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(c: Column, salt: str = "") -> Column:
    """60-bit integer from md5 of (salt || value). Portable across engines."""
    salted = F.concat(F.lit(salt), c) if salt else c
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: str = "") -> str:
    """DuckDB-runnable SQL equivalent of :func:`md5_long`."""
    salted = f"concat('{salt}', {expr})" if salt else expr
    # DuckDB: hex-string → integer via from_hex blob is awkward; use the
    # documented md5_number_lower/upper split?  Portable route: parse the
    # 15-hex-char prefix manually with a polynomial — but DuckDB supports
    # CAST(concat('0x', h) AS BIGINT) since 0.9 (hex literals in casts).
    return f"CAST(concat('0x', substring(md5({salted}), 1, 15)) AS BIGINT)"


def normalize_text(c: Column) -> Column:
    """Lowercase, collapse whitespace, strip — canonical form for dedup."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


NORMALIZE_TEXT_SQL = "trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def tokens(c: Column) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize_text(c), " ")


def token_hashes(c: Column) -> Column:
    """xxhash64 of every token → array<long>.  Single-use-safe: feed the
    RESULT into :func:`shingle_hashes_from_token_hashes` via a separate
    projection (see the CSE note there)."""
    return F.transform(tokens(c), lambda t: F.xxhash64(t))


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Word k-shingles from an already-materialized token-array COLUMN →
    array<string> (distinct).

    ``toks`` MUST be a plain column reference (attribute), not an inline
    expression: Catalyst does not eliminate common subexpressions inside
    higher-order-function lambdas, so an embedded ``split(regexp_…)``
    would be re-evaluated once per shingle — O(tokens²) per row (measured
    ~6× on the whole MinHash pipeline at sf0.1).  Materializing the token
    array in its own projection makes every lambda reference a cheap
    attribute lookup, and CollapseProject keeps the projection because the
    producing expression is non-cheap and multiply-referenced.
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def shingles(c: Column, k: int = 3) -> Column:
    """Word k-shingles of a text column → array<string> (distinct).

    Convenience form for tests/small inputs.  Hot paths must use
    :func:`shingles_from_tokens` over a materialized token column — this
    inline form re-tokenizes per shingle (see the CSE note above).
    """
    return shingles_from_tokens(tokens(c), k)


def shingle_hashes_from_token_hashes(tok_h: Column, k: int = 3) -> Column:
    """k-shingle hashes from an already-materialized token-hash COLUMN
    (see :func:`token_hashes`): combine k consecutive token hashes with a
    wrapping polynomial (distinct-preserving enough at 64 bits for
    MinHash/Jaccard).  No shingle-string allocation, one string hash per
    token — the dedup hot path at corpus scale.  Same attribute-only
    contract as :func:`shingles_from_tokens`.
    """
    n = F.size(tok_h)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    p = F.lit(1099511628211)  # FNV-ish odd multiplier, wrapping int64

    def combine(i: Column) -> Column:
        h = F.element_at(tok_h, i)
        for j in range(1, k):
            nxt = F.coalesce(
                F.element_at(tok_h, i + j), F.lit(-40343)
            )
            h = h * p + nxt
        return h

    return F.array_distinct(F.transform(idx, combine))


def shingle_hashes(c: Column, k: int = 3) -> Column:
    """Inline convenience form of :func:`shingle_hashes_from_token_hashes`
    (tests/small inputs only — re-tokenizes per shingle, see CSE note)."""
    return shingle_hashes_from_token_hashes(token_hashes(c), k)

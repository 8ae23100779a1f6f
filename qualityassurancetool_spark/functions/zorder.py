"""Z-order (Morton) keys for multi-dimensional data layout.

A 100 TB table laid out by one column prunes scans on that column
only; a lat/long (or price/key, time/stream) workload filters on TWO.
Interleaving the bits of both grid cells puts 2-D-close rows close on
a 1-D key, so ``repartitionByRange + sortWithinPartitions`` on the key
yields parquet files whose per-file min/max statistics are tight in
BOTH dimensions — file skipping works for rectangle predicates (the
layout device behind Delta/Iceberg's OPTIMIZE ZORDER, public
literature: Morton 1966; Delta Lake docs).

Everything is pure JVM Column arithmetic: cell quantization is one
clamp+scale, and the bit interleave is the classic 5-step magic-mask
spread (no loops over bits, no UDF, ~12 codegen'd ops per key).  The
identical expression renders to DuckDB SQL (same masks, same ops) for
the cross-engine oracle — ``tools/extra_oracles.py::x_zorder``.

Key fits a signed 64-bit long: 2 dims × ``bits`` ≤ 31 each ≤ 62 bits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# magic masks for spreading a 32-bit value into the even bit positions
# of a 64-bit word (x -> x with a zero bit after every data bit)
_SPREAD_STEPS: list[tuple[int, int]] = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_bits(c: Column) -> Column:
    """Even-position bit spread of a non-negative < 2^31 long."""
    x = c.cast("long")
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _spread_sql(expr: str) -> str:
    x = f"CAST({expr} AS BIGINT)"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def grid_cell(
    c: Column, lo: float, hi: float, bits: int = 16
) -> Column:
    """Quantize ``c`` into an integer cell in [0, 2^bits): clamp to
    [lo, hi), scale, floor.  Nulls map to cell 0 (they sort first)."""
    n = 1 << bits
    scaled = F.floor((c - F.lit(lo)) / F.lit(hi - lo) * F.lit(n))
    # least/greatest SKIP nulls (both engines), so a null input must be
    # short-circuited before the clamp, not coalesced after it
    return F.when(c.isNull(), F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.least(F.lit(n - 1), scaled))
    ).cast("long")


def _grid_cell_sql(expr: str, lo: float, hi: float, bits: int) -> str:
    n = 1 << bits
    scaled = f"CAST(floor((({expr}) - {lo}) / {hi - lo} * {n}) AS BIGINT)"
    return (
        f"(CASE WHEN ({expr}) IS NULL THEN 0 "
        f"ELSE greatest(0, least({n - 1}, {scaled})) END)"
    )


def morton_key(x_cell: Column, y_cell: Column, bits: int = 16) -> Column:
    """Interleaved 2-D Morton key from integer cells in [0, 2^bits);
    x occupies even bit positions, y odd."""
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    return spread_bits(x_cell).bitwiseOR(
        F.shiftleft(spread_bits(y_cell), 1)
    )


def morton_key_sql(x_cell_expr: str, y_cell_expr: str) -> str:
    """DuckDB rendering of :func:`morton_key` (bit-identical)."""
    return (
        f"({_spread_sql(x_cell_expr)} | ({_spread_sql(y_cell_expr)} << 1))"
    )


def zorder_key(
    x: Column,
    x_range: tuple[float, float],
    y: Column,
    y_range: tuple[float, float],
    bits: int = 16,
) -> Column:
    """End-to-end: quantize two numeric columns over explicit ranges
    and interleave.  Ranges are explicit (not inferred with a corpus
    pass) so keys are stable across incremental writes — the layout
    contract for appendable tables."""
    return morton_key(
        grid_cell(x, *x_range, bits=bits),
        grid_cell(y, *y_range, bits=bits),
        bits=bits,
    )


def zorder_key_sql(
    x_expr: str,
    x_range: tuple[float, float],
    y_expr: str,
    y_range: tuple[float, float],
    bits: int = 16,
) -> str:
    """DuckDB rendering of :func:`zorder_key` (bit-identical)."""
    return morton_key_sql(
        _grid_cell_sql(x_expr, *x_range, bits),
        _grid_cell_sql(y_expr, *y_range, bits),
    )

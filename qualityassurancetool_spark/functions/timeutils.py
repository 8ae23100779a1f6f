"""Timestamp helpers shared by the window-family operators.

All window arithmetic in this engine runs over *integer microseconds* so
range frames are exact (no float ordering) and so Spark and SQL oracles
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ensure_timestamp(df: DataFrame, col_name: str) -> DataFrame:
    """Cast ``col_name`` from TIMESTAMP_NTZ to TIMESTAMP if needed.

    Parquet without tz metadata reads as NTZ under Spark 4; watermarks and
    ``unix_micros`` require TIMESTAMP.  Under the UTC session timezone the
    cast is value-exact.  Returns the frame unchanged when the column is
    already TIMESTAMP (or absent), so it is safe to call unconditionally.
    Works on both batch and streaming frames.
    """
    for f_ in df.schema.fields:
        if f_.name == col_name and isinstance(f_.dataType, T.TimestampNTZType):
            return df.withColumn(col_name, F.col(col_name).cast("timestamp"))
    return df


def epoch_micros(ts: Column | str) -> Column:
    """Timestamp → integer epoch microseconds (exact; frame-friendly).

    The input is cast to ``TIMESTAMP`` first: parquet files without tz
    metadata surface as ``TIMESTAMP_NTZ`` under Spark 4, and
    ``unix_micros`` rejects NTZ.  With a UTC session timezone the cast is
    value-exact, and for already-``TIMESTAMP`` inputs Catalyst removes the
    no-op cast, so this costs nothing in the plan.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(c.cast("timestamp"))


def epoch_seconds(ts: Column | str) -> Column:
    """Timestamp → epoch seconds as double (µs fraction preserved)."""
    return epoch_micros(ts) / F.lit(1_000_000.0)


def round_to_seconds(ts: Column | str, half_even: bool = False) -> Column:
    """Round to nearest second (reference ``.round("1s")``,
    ``src/aums_data_request.py:91-94``).  Default is half-up on the µs
    fraction — deterministic, portable, and matching the SQL oracles'
    integer formula.  ``half_even=True`` reproduces pandas'
    banker's-rounding tie rule exactly (ties at .500000 s go to the even
    second) — the golden-fixture replay path
    (``tests/test_reference_goldens.py``) needs it: the reference's
    ``aums`` export contains 57 exact-half-second timestamps."""
    us = epoch_micros(ts)
    rounded_s = F.floor((us + 500_000) / 1_000_000)
    if half_even:
        sec = F.floor(us / 1_000_000)
        is_tie = (us - sec * 1_000_000) == 500_000
        rounded_s = F.when(is_tie, sec + F.pmod(sec, F.lit(2))).otherwise(rounded_s)
    return F.timestamp_micros((rounded_s * 1_000_000).cast("long"))


def floor_to_seconds(ts: Column | str) -> Column:
    us = epoch_micros(ts)
    return F.timestamp_micros((F.floor(us / 1_000_000) * 1_000_000).cast("long"))


def parse_timedelta_seconds(spec: str | float | int) -> float:
    """Parse config timedelta literals (``"0.5s"``, ``"10min"``, ``"60min"``,
    ``"2h"``, ``"1d"``) to seconds — the reference's pandas-offset grammar
    (``src/yaml_schema.py:7-43``) reduced to the units it actually uses."""
    if isinstance(spec, (int, float)):
        return float(spec)
    s = spec.strip().lower()
    units = {
        "ms": 1e-3,
        "s": 1.0,
        "sec": 1.0,
        "secs": 1.0,
        "second": 1.0,
        "seconds": 1.0,
        "min": 60.0,
        "minute": 60.0,
        "minutes": 60.0,
        "t": 60.0,
        "h": 3600.0,
        "hr": 3600.0,
        "hour": 3600.0,
        "hours": 3600.0,
        "d": 86400.0,
        "day": 86400.0,
        "days": 86400.0,
    }
    # longest-suffix match
    for unit in sorted(units, key=len, reverse=True):
        if s.endswith(unit):
            num = s[: -len(unit)].strip()
            if num == "":
                num = "1"
            return float(num) * units[unit]
    return float(s)  # bare number = seconds


def timedelta_micros(spec: str | float | int) -> int:
    """THE timedelta→integer-µs conversion for window bounds.  ROUNDS,
    never truncates: float-seconds specs carry ulp noise (2.675 s is
    2674999.999… µs as a double), and a site that truncates while its
    scale twin rounds puts two rows exactly on the boundary in one
    window and out of the other — breaking the twins' row-for-row
    parity contract (review finding, round 8).  Every operator that has
    a bucketed/SQL twin derives its bounds here."""
    return int(round(parse_timedelta_seconds(spec) * 1_000_000))

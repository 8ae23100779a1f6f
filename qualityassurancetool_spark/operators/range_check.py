"""Strict range check (reference P5: ``get_bool_out_of_range``,
call site ``src/main.py:723-731``; semantics pinned by
``tests/test_qc.py:658-668`` — thresholds 2.0/9.2 flag the endpoints, i.e.
the comparison is **strict**: in-range means ``min < v < max``).

Null thresholds propagate null (reference: NaN threshold ⇒ NaN bool), so a
later ``flag_from_bool(..., flag_on_nan=None)`` leaves those rows untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import QualityFlags, flag_from_bool, flag_merge


def in_range_bool(value: Column, vmin: Column, vmax: Column) -> Column:
    """True iff strictly inside (vmin, vmax); null if any input null."""
    return (value > vmin) & (value < vmax)


def out_of_range_bool(value: Column, vmin: Column, vmax: Column) -> Column:
    """Reference polarity: True = OUT of range (flag-worthy)."""
    return ~in_range_bool(value, vmin, vmax)


def apply_range_check(
    df: DataFrame,
    value_col: str,
    min_col: str,
    max_col: str,
    flag_col: str = "qc_flag",
    flag_on_true: int = QualityFlags.BAD,
    flag_on_false: int = QualityFlags.NO_QUALITY_CONTROL,
    flag_on_nan: int | None = None,
) -> DataFrame:
    """Evaluate the strict range predicate and severity-merge the resulting
    flag into ``flag_col`` (reference ``QCFlagConfig.execute`` pattern,
    ``src/main.py:723-733``)."""
    b = out_of_range_bool(F.col(value_col), F.col(min_col), F.col(max_col))
    new_flag = flag_from_bool(b, flag_on_true, flag_on_false, flag_on_nan)
    return df.withColumn(flag_col, flag_merge(F.col(flag_col), new_flag))

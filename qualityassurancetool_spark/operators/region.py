"""Region checks (reference P6/P7: ``get_bool_null_region`` /
``get_bool_land_region``, ``src/main.py:535-555``; fixture expectations
``tests/test_qc.py:62-90``; ``README.adoc:208-216``).

- null region  ⇒ PROBABLY_BAD (coastline layers miss internal waters)
- region name contains "MAINLAND" (case-insensitive) ⇒ BAD

Both are single Column predicates merged through the flag algebra.  The
polygon lookup that *produces* the region column lives in
``sources/spatial.py`` (broadcast-polygon pandas UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import (
    QualityFlags,
    apply_feature_flag,
    flag_from_bool,
    flag_merge,
)


def null_region_bool(region_col: str = "region"):
    return F.col(region_col).isNull()


def land_region_bool(region_col: str = "region"):
    return F.upper(F.col(region_col)).contains("MAINLAND")


def apply_region_checks(
    df: DataFrame,
    region_col: str = "region",
    flag_col: str = "qc_flag",
) -> DataFrame:
    nan_flag = flag_from_bool(
        null_region_bool(region_col),
        flag_on_true=QualityFlags.PROBABLY_BAD,
        flag_on_false=QualityFlags.NO_QUALITY_CONTROL,
    )
    land_flag = flag_from_bool(
        F.coalesce(land_region_bool(region_col), F.lit(False)),
        flag_on_true=QualityFlags.BAD,
        flag_on_false=QualityFlags.NO_QUALITY_CONTROL,
    )
    return df.withColumn(
        flag_col, flag_merge(F.col(flag_col), nan_flag, land_flag)
    )


def apply_feature_region_check(
    df: DataFrame,
    region_col: str = "region",
    flag_col: str = "qc_flag",
    feature_flag_col: str = "feature_qc_flag",
    overwrite: bool = True,
) -> DataFrame:
    """Feature-level land check (reference ``src/main.py:577-592``): the
    on-land verdict belongs to the *FeatureOfInterest* (the position), so
    it lands in ``feature_qc_flag`` and is then severity-merged into the
    row flag — the reference's two ``execute(column=FEATURE_QC_FLAG)``
    calls.  Flags: on land ⇒ BAD, unknown region ⇒ NO_QUALITY_CONTROL."""
    return apply_feature_flag(
        df,
        bool_col=land_region_bool(region_col),
        flag_on_true=QualityFlags.BAD,
        flag_on_nan=QualityFlags.NO_QUALITY_CONTROL,
        overwrite=overwrite,
        feature_flag_col=feature_flag_col,
        flag_col=flag_col,
    )

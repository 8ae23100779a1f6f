"""Feature-level flag path (reference Df.FEATURE_QC_FLAG,
src/main.py:573-592,638-652): a location-owned check writes
feature_qc_flag, merges it into the row flag, and PATCHes one body per
FeatureOfInterest."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import QualityFlags, apply_feature_flag
from qualityassurancetool_spark.operators.region import (
    apply_feature_region_check,
)
from qualityassurancetool_spark.sources.sinks import (
    build_feature_patch_bodies,
)

SCHEMA = (
    "iot_id long, feature_id long, region string, qc_flag tinyint, "
    "feature_qc_flag tinyint"
)


@pytest.fixture()
def obs(spark):
    rows = [
        (1, 10, "MAINLAND_BE", 0, None),   # on land -> BAD
        (2, 10, "MAINLAND_BE", 1, None),   # same feature, GOOD row flag
        (3, 20, "NORTH_SEA", 0, None),     # at sea -> NO_QC
        (4, 30, None, 0, None),            # unknown region -> NO_QC
        (5, None, "MAINLAND_NL", 0, None), # no feature id (row flag only)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_feature_region_check_writes_both_flags(spark, obs):
    out = {
        r["iot_id"]: r
        for r in apply_feature_region_check(obs).collect()
    }
    # on-land features: BAD feature flag, merged into row flag
    assert out[1]["feature_qc_flag"] == QualityFlags.BAD
    assert out[1]["qc_flag"] == QualityFlags.BAD
    assert out[2]["feature_qc_flag"] == QualityFlags.BAD
    assert out[2]["qc_flag"] == QualityFlags.BAD  # GOOD loses to BAD
    # at sea / unknown: NO_QUALITY_CONTROL feature flag, row flag unchanged
    assert out[3]["feature_qc_flag"] == QualityFlags.NO_QUALITY_CONTROL
    assert out[3]["qc_flag"] == QualityFlags.NO_QUALITY_CONTROL
    assert out[4]["feature_qc_flag"] == QualityFlags.NO_QUALITY_CONTROL
    # featureless rows still get the row-flag merge
    assert out[5]["qc_flag"] == QualityFlags.BAD


def test_overwrite_vs_merge_semantics(spark):
    # pre-existing BAD feature flag; new check says NO_QC
    df = spark.createDataFrame(
        [(1, 10, "NORTH_SEA", 0, QualityFlags.BAD.value)], SCHEMA
    )
    over = apply_feature_region_check(df, overwrite=True).collect()[0]
    assert over["feature_qc_flag"] == QualityFlags.NO_QUALITY_CONTROL
    kept = apply_feature_region_check(df, overwrite=False).collect()[0]
    assert kept["feature_qc_flag"] == QualityFlags.BAD  # severity merge


def test_apply_feature_flag_creates_column(spark):
    df = spark.createDataFrame(
        [(1, 10, 0)], "iot_id long, feature_id long, qc_flag tinyint"
    )
    out = apply_feature_flag(
        df, bool_col=F.lit(True), flag_on_true=QualityFlags.PROBABLY_BAD
    ).collect()[0]
    assert out["feature_qc_flag"] == QualityFlags.PROBABLY_BAD
    assert out["qc_flag"] == QualityFlags.PROBABLY_BAD


def test_feature_patch_bodies(spark, obs):
    flagged = apply_feature_region_check(obs)
    bodies = {
        r["entity_id"]: r for r in build_feature_patch_bodies(flagged).collect()
    }
    # one body per feature (feature 10 had TWO observation rows), none for
    # the null-feature row
    assert set(bodies) == {10, 20, 30}
    assert bodies[10]["url_path"] == "FeaturesOfInterest(10)"
    assert json.loads(bodies[10]["body"]) == {
        "properties": {"qc_flag": int(QualityFlags.BAD)}
    }
    assert json.loads(bodies[20]["body"]) == {
        "properties": {"qc_flag": int(QualityFlags.NO_QUALITY_CONTROL)}
    }


def test_feature_patch_severity_max_across_rows(spark):
    # rows of one feature disagree (overlapping windows): body takes the
    # severity max, deterministically
    df = spark.createDataFrame(
        [
            (1, 10, QualityFlags.GOOD.value),
            (2, 10, QualityFlags.BAD.value),
            (3, 10, QualityFlags.PROBABLY_GOOD.value),
        ],
        "iot_id long, feature_id long, feature_qc_flag tinyint",
    )
    bodies = build_feature_patch_bodies(df).collect()
    assert len(bodies) == 1
    assert json.loads(bodies[0]["body"])["properties"]["qc_flag"] == int(
        QualityFlags.BAD
    )


def test_registry_wires_feature_flags(spark):
    from qualityassurancetool_spark.config import QCConfig
    from qualityassurancetool_spark.plans.registry import (
        run_registered_checks,
    )

    cfg = QCConfig.from_dict(
        {
            "QC": [],
            "feature_flags": True,
            "region_polygons": [
                {
                    "name": "MAINLAND",
                    "coords": [[0, 0], [10, 0], [10, 10], [0, 10]],
                }
            ],
        }
    )
    df = spark.createDataFrame(
        [(1, 5.0, 5.0, 0), (2, 50.0, 50.0, 0)],
        "iot_id long, long double, lat double, qc_flag tinyint",
    )
    out = {
        r["iot_id"]: r
        for r in run_registered_checks(
            df, cfg, spark, checks=["region"]
        ).collect()
    }
    assert out[1]["feature_qc_flag"] == QualityFlags.BAD
    assert out[1]["qc_flag"] == QualityFlags.BAD
    # outside every polygon -> null region -> PROBABLY_BAD row flag (P6)
    # but feature flag NO_QC (land verdict unknown-is-not-bad)
    assert out[2]["feature_qc_flag"] == QualityFlags.NO_QUALITY_CONTROL
    assert out[2]["qc_flag"] == QualityFlags.PROBABLY_BAD

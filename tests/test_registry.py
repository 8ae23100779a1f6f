"""Check registry (§2.10 extension contract): the registered chain must
equal manual operator composition, honor config-absent skips, and accept
user-registered checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.config import QCConfig
from qualityassurancetool_spark.plans.registry import (
    CHECK_REGISTRY,
    register_check,
    run_registered_checks,
)
from qualityassurancetool_spark.schema import events_as_observations

SF_DIR = "/root/testdata/sf0.001"

FULL_CFG = {
    "QC": [
        {"id": t, "range": {"min": 1.0, "max": 250.0}}
        for t in ["click", "purchase", "view", "signup", "error"]
    ],
    "location": {"max_velocity": 20.0, "max_dx_dt": 5.0, "time_window": "10min"},
    "region_polygons": [
        {
            "name": "MAINLAND EUROPE",
            "coords": [
                [3.00005, 51.00005],
                [3.08005, 51.00005],
                [3.08005, 51.08005],
                [3.00005, 51.08005],
            ],
        },
        {
            "name": "NORTH SEA",
            "coords": [
                [3.00005, 51.00005],
                [3.19995, 51.00005],
                [3.19995, 51.19995],
                [3.00005, 51.19995],
            ],
        },
    ],
}


def test_full_chain_runs_and_flags(spark):
    obs = events_as_observations(spark, SF_DIR)
    cfg = QCConfig.from_dict(FULL_CFG)
    out = run_registered_checks(obs, cfg, spark)
    hist = {
        r["f"]: r["n"]
        for r in out.groupBy(F.col("qc_flag").cast("int").alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(hist.values()) == obs.count()
    # region BAD (MAINLAND) + range BAD exist; PROBABLY_BAD from null region
    assert hist.get(4, 0) > 0
    assert hist.get(3, 0) > 0


def test_chain_equals_manual_composition(spark):
    from qualityassurancetool_spark.operators.region import apply_region_checks
    from qualityassurancetool_spark.plans.qc_pipeline import run_qc_pipeline
    from qualityassurancetool_spark.sources.spatial import assign_region

    obs = events_as_observations(spark, SF_DIR)
    cfg = QCConfig.from_dict(
        {"QC": FULL_CFG["QC"], "region_polygons": FULL_CFG["region_polygons"]}
    )
    got = run_registered_checks(
        obs, cfg, spark, checks=["region", "range_gradient_zscore"]
    )
    want = run_qc_pipeline(
        apply_region_checks(assign_region(obs, cfg.region_polygons)),
        cfg,
        spark,
        stream_key="observation_type",
    )
    g = {r["iot_id"]: r["qc_flag"] for r in got.select("iot_id", "qc_flag").collect()}
    w = {r["iot_id"]: r["qc_flag"] for r in want.select("iot_id", "qc_flag").collect()}
    assert g == w


def test_unconfigured_checks_are_noops(spark):
    obs = events_as_observations(spark, SF_DIR)
    cfg = QCConfig.from_dict({})
    out = run_registered_checks(obs, cfg, spark)
    assert out.where(F.col("qc_flag") != 0).count() == 0


def test_unknown_check_raises(spark):
    obs = events_as_observations(spark, SF_DIR)
    with pytest.raises(KeyError):
        run_registered_checks(obs, QCConfig(), spark, checks=["nope"])


def test_user_registered_check_participates(spark):
    @register_check("always_probably_bad_on_even")
    def _custom(df, cfg, spark_, stream_col):
        from qualityassurancetool_spark.flags import (
            QualityFlags,
            flag_from_bool,
            flag_merge,
        )

        return df.withColumn(
            "qc_flag",
            flag_merge(
                F.col("qc_flag"),
                flag_from_bool(
                    F.col("iot_id") % 2 == 0,
                    flag_on_true=QualityFlags.PROBABLY_BAD,
                ),
            ),
        )

    try:
        obs = events_as_observations(spark, SF_DIR)
        out = run_registered_checks(
            obs, QCConfig(), spark, checks=["always_probably_bad_on_even"]
        )
        rows = out.select("iot_id", "qc_flag").collect()
        assert all(
            (r["qc_flag"] == 3) == (r["iot_id"] % 2 == 0) for r in rows
        )
    finally:
        CHECK_REGISTRY.pop("always_probably_bad_on_even", None)

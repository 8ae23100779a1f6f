"""Parity net for the registered-check chain plan memo
(plans/registry.run_registered_checks): a memo hit must be
observationally invisible, and EVERY config mutation — nested field,
polygon vertex, drift knob, dynamically-set attribute — must rebuild.
"""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.config import QCConfig
from qualityassurancetool_spark.plans import registry
from qualityassurancetool_spark.plans.registry import (
    _CHAIN_MEMO,
    run_registered_checks,
)


def _cfg_dict():
    return {
        "QC": [
            {
                "id": "click",
                "range": {"min": 1.0, "max": 250.0},
                "gradient": {"min": -50.0, "max": 50.0},
                "zscore": {"min": -3.0, "max": 3.0},
            },
            {"id": "error", "range": {"min": 0.0, "max": 100.0}},
        ],
        "zscore_time_window": "60min",
        "location": {
            "max_velocity": 200.0,
            "max_dx_dt": 5.0,
            "time_window": "10min",
        },
        "region_polygons": [
            {
                "name": "MAINLAND EUROPE",
                "coords": [
                    [-5.0, 40.0],
                    [10.0, 40.0],
                    [10.0, 55.0],
                    [-5.0, 55.0],
                ],
            }
        ],
        "QC_dependent": [
            {
                "independent": "error",
                "dependent": "click",
                "dt_tolerance": "60s",
                "flag_when_missing": 2,
            }
        ],
    }


@pytest.fixture
def obs(spark):
    from qualityassurancetool_spark.schema import events_as_observations

    return events_as_observations(spark, "/root/testdata/sf0.001")


def test_memo_hit_same_values_fresh_cfg_object(spark, obs):
    _CHAIN_MEMO.clear()
    a = run_registered_checks(obs, QCConfig.from_dict(_cfg_dict()), spark)
    b = run_registered_checks(obs, QCConfig.from_dict(_cfg_dict()), spark)
    assert b is a  # plan memo hit: same immutable DataFrame object
    assert len(_CHAIN_MEMO) == 1


def test_memo_hit_results_match_fresh_build(spark, obs):
    _CHAIN_MEMO.clear()
    first = run_registered_checks(
        obs, QCConfig.from_dict(_cfg_dict()), spark
    )
    memoized = run_registered_checks(
        obs, QCConfig.from_dict(_cfg_dict()), spark
    ).select("iot_id", F.col("qc_flag").cast("int").alias("f"))
    _CHAIN_MEMO.clear()
    fresh = run_registered_checks(
        obs, QCConfig.from_dict(_cfg_dict()), spark
    ).select("iot_id", F.col("qc_flag").cast("int").alias("f"))
    assert fresh is not first  # cleared memo really rebuilt the plan
    assert sorted(map(tuple, memoized.collect())) == sorted(
        map(tuple, fresh.collect())
    )


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: d["QC"][0]["range"].__setitem__("max", 240.0),
        lambda d: d["QC"][1].pop("range"),
        lambda d: d["region_polygons"][0]["coords"][2].__setitem__(
            1, 56.0
        ),
        lambda d: d["location"].__setitem__("max_velocity", 150.0),
        lambda d: d["QC_dependent"][0].__setitem__(
            "dt_tolerance", "30s"
        ),
        lambda d: d.__setitem__(
            "drift", {"ewma": {"nsigma": 3.0}}
        ),
    ],
)
def test_any_config_mutation_rebuilds(spark, obs, mutate):
    _CHAIN_MEMO.clear()
    base = run_registered_checks(
        obs, QCConfig.from_dict(_cfg_dict()), spark
    )
    d = _cfg_dict()
    mutate(d)
    changed = run_registered_checks(
        obs, QCConfig.from_dict(d), spark
    )
    assert changed is not base


def test_dynamic_attribute_rebuilds(spark, obs):
    _CHAIN_MEMO.clear()
    base = run_registered_checks(
        obs, QCConfig.from_dict(_cfg_dict()), spark
    )
    cfg = QCConfig.from_dict(_cfg_dict())
    cfg.region_strategy = "mask"  # set AFTER construction
    changed = run_registered_checks(obs, cfg, spark)
    assert changed is not base
    # the derived mask cache itself must NOT affect the key: the same
    # mutated config re-digests equal with/without it
    again = run_registered_checks(
        obs, (lambda c: (setattr(c, "region_strategy", "mask"), c)[1])(
            QCConfig.from_dict(_cfg_dict())
        ),
        spark,
    )
    assert again is changed


def test_different_input_frame_rebuilds(spark, obs):
    from qualityassurancetool_spark.schema import events_as_observations

    _CHAIN_MEMO.clear()
    a = run_registered_checks(
        obs, QCConfig.from_dict(_cfg_dict()), spark
    )
    other = events_as_observations(spark, "/root/testdata/sf0.01")
    b = run_registered_checks(
        other, QCConfig.from_dict(_cfg_dict()), spark
    )
    assert b is not a


def test_materialize_and_jdbc_bypass_memo(spark, obs):
    _CHAIN_MEMO.clear()
    d = _cfg_dict()
    cfg = QCConfig.from_dict(d)
    cfg.asof_materialize = True
    run_registered_checks(obs, cfg, spark)
    assert len(_CHAIN_MEMO) == 0  # materializing build never stored
    cfg2 = QCConfig.from_dict(_cfg_dict())
    cfg2.region_polygons = None
    cfg2.region_polygons_jdbc = {"url": "jdbc:...", "table": "polys"}
    # a pending DB source must bypass (the build would read a live DB);
    # here the region check would fail on the fake url, so only assert
    # the bypass decision path stays un-memoized by digesting
    assert registry._cfg_digest(cfg2) != registry._cfg_digest(
        QCConfig.from_dict(_cfg_dict())
    )


def test_stale_spark_context_not_served(spark, obs):
    _CHAIN_MEMO.clear()
    a = run_registered_checks(
        obs, QCConfig.from_dict(_cfg_dict()), spark
    )
    # poison the stored context identity: a recreated session must
    # rebuild instead of serving the dead session's plan
    key, ent_in, ent_out, _sc = _CHAIN_MEMO[0]
    _CHAIN_MEMO[0] = (key, ent_in, ent_out, object())
    b = run_registered_checks(
        obs, QCConfig.from_dict(_cfg_dict()), spark
    )
    assert b is not a

"""``parity: reference`` — the one-switch golden-replay preset, proven
END-TO-END: the YAML config path (``QCConfig.from_yaml``) must flip every
reference-parity knob at once, and the *configured* check chain
(``plans/registry.run_registered_checks``) must reproduce the reference's
own shipped golden counts — not just the operators called directly (those
are pinned in ``tests/test_reference_goldens.py``).

Golden anchors (reference checkout, read-only):
- ``tests/resources/df_outliers.csv``: 60-min rolling z-score at ±25 ⇒
  exactly 9 outliers (reference ``tests/test_qc.py:671-679``).
- ``tests/resources/data_velocity_acc.csv`` track: max_velocity 90 ⇒ 0
  flagged; max_velocity 0 ⇒ every row flagged
  (reference ``tests/test_qc.py:395-414``).
- the parametrized spatial-outlier grid (``tests/test_qc.py:263-392``):
  max_dx_dt 300 / 5-min window, ``threshold_mode="span"`` semantics.
"""

from __future__ import annotations

import itertools
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.config import ConfigError, QCConfig
from qualityassurancetool_spark.plans.registry import run_registered_checks

RES = "/root/reference/tests/resources"

needs_goldens = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference golden fixtures not present"
)


def _cfg_from_yaml(tmp_path, text: str) -> QCConfig:
    p = tmp_path / "conf.yaml"
    p.write_text(text)
    return QCConfig.from_yaml(str(p))


# ------------------------------------------------------------ knob wiring


def test_parity_preset_flips_all_knobs(tmp_path):
    cfg = _cfg_from_yaml(tmp_path, "parity: reference\n")
    assert cfg.zscore_frame == "reference"
    assert cfg.geo_distance == "exact"
    assert cfg.geo_marking == "reference"
    assert cfg.outlier_threshold_mode == "span"


def test_parity_default_stays_engine_native(tmp_path):
    cfg = _cfg_from_yaml(tmp_path, "zscore_time_window: 60min\n")
    assert cfg.zscore_frame == "trailing"
    assert cfg.geo_distance == "haversine"
    assert cfg.geo_marking == "pair"
    assert cfg.outlier_threshold_mode == "nominal"


def test_explicit_knob_overrides_parity(tmp_path):
    cfg = _cfg_from_yaml(
        tmp_path,
        "parity: reference\nlocation:\n  distance: haversine\n",
    )
    assert cfg.geo_distance == "haversine"  # explicit wins
    assert cfg.geo_marking == "reference"  # preset still applies
    assert cfg.zscore_frame == "reference"


def test_parity_bogus_value_rejected():
    with pytest.raises(ConfigError, match="parity"):
        QCConfig.from_dict({"parity": "exact"})


def test_zscore_frame_validated():
    with pytest.raises(ConfigError, match="zscore_frame"):
        QCConfig.from_dict({"zscore_frame": "leading"})


def test_reference_frame_accepts_bucketed_strategy():
    """Since round 8 the bucketed scale twin implements the reference
    frame too (boundary-halo lag), so parity + the scale strategy
    compose — validated, not rejected."""
    cfg = QCConfig.from_dict(
        {"parity": "reference", "window_strategy": "bucketed"}
    )
    assert cfg.zscore_frame == "reference"
    assert cfg.window_strategy == "bucketed"


# ------------------------------------- golden replay THROUGH the config


@needs_goldens
def test_configured_chain_replays_zscore_golden(spark, tmp_path):
    """The reference's 9-outlier count (``tests/test_qc.py:671-679``)
    reproduced by the full registry chain driven from one YAML with
    ``parity: reference`` — no operator-level knobs touched."""
    cfg = _cfg_from_yaml(
        tmp_path,
        """
parity: reference
zscore_time_window: 60min
QC:
  - id: 7770
    zscore: {min: -25, max: 25}
  - id: 7850
    zscore: {min: -25, max: 25}
""",
    )
    pdf = pd.read_csv(f"{RES}/df_outliers.csv", index_col=0).rename(
        columns={
            "@iot.id": "iot_id",
            "phenomenonTime": "phenomenon_time",
        }
    )[["iot_id", "result", "phenomenon_time", "datastream_id"]]
    pdf["phenomenon_time"] = pd.to_datetime(pdf["phenomenon_time"])
    df = spark.createDataFrame(pdf).withColumn(
        "qc_flag", F.lit(2).cast("tinyint")  # PROBABLY_GOOD in
    )
    out = run_registered_checks(df, cfg, spark, stream_col="datastream_id")
    n_bad = out.where(F.col("qc_flag") == 4).count()
    assert n_bad == 9


@needs_goldens
def test_configured_bucketed_chain_replays_zscore_golden(spark, tmp_path):
    """The SAME 9-outlier golden through the scale strategy: parity +
    ``window_strategy: bucketed`` routes every window stage through the
    streams×buckets twins, and the count must not move."""
    cfg = _cfg_from_yaml(
        tmp_path,
        """
parity: reference
window_strategy: bucketed
zscore_time_window: 60min
QC:
  - id: 7770
    zscore: {min: -25, max: 25}
  - id: 7850
    zscore: {min: -25, max: 25}
""",
    )
    pdf = pd.read_csv(f"{RES}/df_outliers.csv", index_col=0).rename(
        columns={
            "@iot.id": "iot_id",
            "phenomenonTime": "phenomenon_time",
        }
    )[["iot_id", "result", "phenomenon_time", "datastream_id"]]
    pdf["phenomenon_time"] = pd.to_datetime(pdf["phenomenon_time"])
    df = spark.createDataFrame(pdf).withColumn(
        "qc_flag", F.lit(2).cast("tinyint")
    )
    out = run_registered_checks(df, cfg, spark, stream_col="datastream_id")
    assert out.where(F.col("qc_flag") == 4).count() == 9


@needs_goldens
def test_configured_chain_replays_velocity_golden(spark, tmp_path):
    """Reference ``test_exceed_max_velocity``/``_2`` through the YAML:
    max 90 flags nothing; max 0 flags every row (reference marking
    0-fills tails and tests |v| >= max).  The registry maps reference
    marking to BAD, the reference pipeline's own flag."""
    from tests.test_reference_goldens import _velocity_track

    t = _velocity_track()
    base = spark.createDataFrame(
        t[["iot_id", "phenomenon_time", "lat", "long"]]
    ).withColumns(
        {
            "observation_type": F.lit("ship_track"),
            "qc_flag": F.lit(0).cast("tinyint"),
        }
    )
    n_rows = base.count()

    cfg90 = _cfg_from_yaml(
        tmp_path, "parity: reference\nlocation:\n  max_velocity: 90\n"
    )
    out90 = run_registered_checks(base, cfg90, spark)
    assert out90.where(F.col("qc_flag") == 4).count() == 0

    cfg0 = _cfg_from_yaml(
        tmp_path, "parity: reference\nlocation:\n  max_velocity: 0\n"
    )
    out0 = run_registered_checks(base, cfg0, spark)
    assert out0.where(F.col("qc_flag") == 4).count() == n_rows


@needs_goldens
@pytest.mark.parametrize(
    "idx,dx,columns",
    [
        ([1, 4], 1, ["long"]),
        ([3, 4], -0.1, ["lat", "long"]),
        ([3, 6], -1, ["lat"]),
    ],
)
def test_configured_chain_replays_outlier_grid(
    spark, tmp_path, idx, dx, columns
):
    """A slice of the reference's spatial-outlier grid
    (``tests/test_qc.py:263-392``) replayed exact-set through the YAML —
    the preset's ``threshold_mode="span"`` is what makes these match
    (the full grid is pinned operator-level in test_reference_goldens)."""
    cfg = _cfg_from_yaml(
        tmp_path,
        """
parity: reference
location:
  max_dx_dt: 300
  time_window: 5min
""",
    )
    base = pd.Timestamp("2024-01-01 12:00:00")
    times = [base + pd.Timedelta(seconds=s) for s in range(5)] * 2
    pdf = pd.DataFrame(
        {
            "iot_id": range(10),
            "phenomenon_time": times,
            "long": [i * 0.001 + 50.0 for i in range(10)],
            "lat": [i * 0.001 + 20.0 for i in range(10)],
        }
    )
    for i, c in itertools.product(idx, columns):
        pdf.loc[i, c] -= dx
    df = spark.createDataFrame(pdf).withColumns(
        {
            "observation_type": F.lit("track"),
            "qc_flag": F.lit(None).cast("tinyint"),
        }
    )
    out = (
        run_registered_checks(df, cfg, spark)
        .orderBy("iot_id")
        .select("qc_flag")
        .toPandas()["qc_flag"]
        .to_numpy()
    )
    assert set(np.nonzero(out == 4)[0].tolist()) == set(idx)


def test_location_distance_auto_accepted(tmp_path):
    """geodesic_m accepts 'auto' (its own default) — the config
    validation must not be narrower than the implementation."""
    cfg = _cfg_from_yaml(tmp_path, "location:\n  distance: auto\n")
    assert cfg.geo_distance == "auto"

"""Black-box replay of the reference's OWN shipped golden fixtures.

Every other oracle in this repo is a re-derivation (DuckDB replicas of this
engine's semantics); these tests instead pin the engine to the reference's
real exported acceptance data and its exact test expectations:

- ``df_outliers.csv``      — 6,000 RV Belgica observations; the rolling
  z-score at ±25 must find exactly 9 outliers
  (reference ``tests/test_qc.py:671-679``).
- ``data_velocity_acc.csv`` — geopy-geodesic-built track; velocity /
  acceleration expectations (reference ``tests/test_qc.py:33-47,395-435``).
- ``aums_data_request_response.json`` → ``df_agg.csv`` — the full
  flatten→round→pivot→aggregate export, compared at rtol=0.01
  (reference ``tests/test_other.py:141-170``).
- the parametrized spatial-outlier grids and region-flag fixture
  (reference ``tests/test_qc.py:62-90,263-392``) rebuilt value-for-value.

The fixtures are read directly from the read-only reference checkout; tests
skip (not fail) if that checkout is absent so the suite stays portable.
"""

from __future__ import annotations

import itertools
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

RES = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference golden fixtures not present"
)


# ---------------------------------------------------------------- z-score


def test_zscore_golden_nine_outliers(spark):
    """Reference ``test_qc_outlier`` (``tests/test_qc.py:671-679``): rolling
    60-min z-score per datastream over the shipped 6,000-row export, bounds
    ±25 strict ⇒ exactly 9 outliers."""
    from qualityassurancetool_spark.operators.zscore import calc_zscore

    pdf = pd.read_csv(f"{RES}/df_outliers.csv", index_col=0)
    pdf = pdf.rename(
        columns={
            "@iot.id": "iot_id",
            "phenomenonTime": "phenomenon_time",
            "resultQuality": "qc_flag",
        }
    )[["iot_id", "result", "phenomenon_time", "qc_flag", "datastream_id"]]
    pdf["phenomenon_time"] = pd.to_datetime(pdf["phenomenon_time"])
    df = spark.createDataFrame(pdf)

    scored = calc_zscore(
        df,
        value_col="result",
        ts_col="phenomenon_time",
        group_col="datastream_id",
        rolling_time_window="60min",
        frame="reference",
    )
    n_out = scored.where(
        (F.col("zscore") < F.lit(-25.0)) | (F.col("zscore") > F.lit(25.0))
    ).count()
    assert n_out == 9


# ------------------------------------------------------- velocity golden


def _velocity_track() -> pd.DataFrame:
    """Rebuild the reference's velocity fixture exactly as its conftest does
    (``tests/test_qc.py:33-47``): chain geodesic ``destination`` hops from a
    fixed start point using the CSV's (distance, heading) columns.  geopy's
    Karney destination is reproduced by the WGS-84 Vincenty direct solver
    (sub-mm agreement at these 5-120 m hops)."""
    from qualityassurancetool_spark.functions.geo import vincenty_direct

    t = pd.read_csv(f"{RES}/data_velocity_acc.csv", header=0)
    base = pd.Timestamp("2024-01-01 00:00:00")
    t["phenomenon_time"] = base + pd.to_timedelta(t["Time (s)"], "s")
    lat, lon = 51.37115902107277, 3.1840709669760137
    lats, lons = [], []
    for _, row in t.iterrows():
        lat, lon = vincenty_direct(
            lat, lon, row["Heading (degrees)"], row["Distance (m)"]
        )
        lats.append(lat)
        lons.append(lon)
    t["lat"], t["long"] = lats, lons
    t["iot_id"] = range(len(t))
    return t


@pytest.fixture(scope="module")
def velocity_df(spark):
    t = _velocity_track()
    return spark.createDataFrame(
        t[["iot_id", "phenomenon_time", "lat", "long", "Velocity (m/s)"]].rename(
            columns={"Velocity (m/s)": "velocity_ref"}
        )
    )


def test_velocity_golden_values(velocity_df):
    """The fixture was generated so that segment velocity = next row's
    ``Distance (m)`` / dt; the engine's exact-geodesic velocity (assigned to
    the segment's SECOND row, pandas assigns to the first) must recover the
    shipped ``Velocity (m/s)`` column."""
    from qualityassurancetool_spark.operators.geotrack import (
        with_velocity_acceleration,
    )

    out = (
        with_velocity_acceleration(velocity_df, distance="exact")
        .orderBy("iot_id")
        .select("iot_id", "velocity_ms", "velocity_ref")
        .toPandas()
    )
    computed = out["velocity_ms"].to_numpy()[1:]  # row i ← segment (i-1, i)
    expected = out["velocity_ref"].to_numpy()[:-1]  # ref: segment (i, i+1) at i
    np.testing.assert_allclose(computed, expected, rtol=1e-6)


@pytest.mark.parametrize("distance", ["haversine", "lambert", "exact"])
def test_velocity_golden_bounds(velocity_df, distance):
    """Reference ``test_exceed_max_velocity``/``_2``: at max 90 m/s no row
    flags; at max 0 every row flags (pair-marks-both covers the whole
    track).  True for every distance kernel (velocities 2.5-60 m/s)."""
    from qualityassurancetool_spark.operators.geotrack import (
        apply_velocity_acceleration_check,
    )

    flagged_at_90 = (
        apply_velocity_acceleration_check(
            velocity_df.withColumn("qc_flag", F.lit(None).cast("tinyint")),
            max_velocity_ms=90.0,
            max_acceleration_ms2=1e12,
            distance=distance,
            marking="reference",
        )
        .where(F.col("qc_flag") == 3)
        .count()
    )
    assert flagged_at_90 == 0

    flagged_at_0 = (
        apply_velocity_acceleration_check(
            velocity_df.withColumn("qc_flag", F.lit(None).cast("tinyint")),
            max_velocity_ms=0.0,
            max_acceleration_ms2=1e12,
            distance=distance,
            marking="reference",
        )
        .where(F.col("qc_flag") == 3)
        .count()
    )
    assert flagged_at_0 == velocity_df.count()


def test_velocity_golden_tiny_dt_flags_segment_first_row(spark):
    """Reference ``test_exceed_max_velocity_3``: squeezing segment (3,4)'s
    dt to ~0 makes its velocity explode past the limit and must flag
    EXACTLY row 3 — the segment's first row, the reference's assignment
    convention.  (The reference uses a 1 ns squeeze; Spark timestamps are
    µs-resolution so the squeeze is 1 µs — same semantics.)"""
    from qualityassurancetool_spark.operators.geotrack import (
        apply_velocity_acceleration_check,
    )

    t = _velocity_track()
    t.loc[4, "phenomenon_time"] = t.loc[3, "phenomenon_time"] + pd.Timedelta(
        microseconds=1
    )
    df = spark.createDataFrame(
        t[["iot_id", "phenomenon_time", "lat", "long"]]
    ).withColumn("qc_flag", F.lit(None).cast("tinyint"))
    out = (
        apply_velocity_acceleration_check(
            df,
            max_velocity_ms=90.0,
            max_acceleration_ms2=1e12,
            marking="reference",
        )
        .orderBy("iot_id")
        .select("qc_flag")
        .toPandas()["qc_flag"]
        .to_numpy()
    )
    flagged = set(np.nonzero(out == 3)[0].tolist())
    assert flagged == {3}


@pytest.mark.parametrize("idx0", [1, 2, 3, 4, 5, 6])
def test_acceleration_golden_marks_pair(spark, idx0):
    """Reference ``test_exceed_max_acceleration`` (``tests/test_qc.py:415-435``):
    squeezing dt after row ``idx0`` makes the acceleration at ``idx0``
    explode; rows ``idx0-1`` and ``idx0`` must flag at max 25 m/s²."""
    from qualityassurancetool_spark.operators.geotrack import (
        apply_velocity_acceleration_check,
    )

    t = _velocity_track()
    t.loc[idx0 + 1, "phenomenon_time"] = t.loc[idx0, "phenomenon_time"] + pd.Timedelta(
        microseconds=1
    )
    df = spark.createDataFrame(
        t[["iot_id", "phenomenon_time", "lat", "long"]]
    ).withColumn("qc_flag", F.lit(None).cast("tinyint"))
    out = (
        apply_velocity_acceleration_check(
            df,
            max_velocity_ms=1e12,
            max_acceleration_ms2=25.0,
            marking="reference",
        )
        .orderBy("iot_id")
        .select("qc_flag")
        .toPandas()["qc_flag"]
        .to_numpy()
    )
    flagged = set(np.nonzero(out == 3)[0].tolist())
    assert flagged == {idx0 - 1, idx0}


# ------------------------------------------- spatial-outlier grid replay

# The reference's synthetic 10-row track (``tests/test_qc.py:263-392``):
# lon = idx·0.001 + 50, lat = idx·0.001 + 20, timestamps t0..t4 repeated
# (rows (0,5),(1,6),... share a second).  max_dx_dt=300, window "5min".


def _outlier_grid(spark, perturb):
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
    perturb(pdf)
    df = spark.createDataFrame(pdf).withColumn(
        "qc_flag", F.lit(None).cast("tinyint")
    )
    from qualityassurancetool_spark.operators.spatial_outlier import (
        apply_spatial_outlier_check,
    )

    out = (
        apply_spatial_outlier_check(
            df, max_dx_dt=300.0, time_window="5min", threshold_mode="span"
        )
        .orderBy("iot_id")
        .select("qc_flag")
        .toPandas()["qc_flag"]
        .to_numpy()
    )
    return set(np.nonzero(out == 4)[0].tolist())


@pytest.mark.parametrize(
    "idx,dx,columns",
    [
        ([1, 4], 1, ["long"]),
        ([3, 4], 1, ["lat"]),
        ([3, 4], -0.1, ["long"]),
        ([3, 4], -0.1, ["lat", "long"]),
        ([3, 6], -1, ["lat"]),
    ],
)
def test_location_outlier_golden(spark, idx, dx, columns):
    def perturb(pdf):
        for i, c in itertools.product(idx, columns):
            pdf.loc[i, c] -= dx

    assert _outlier_grid(spark, perturb) == set(idx)


@pytest.mark.parametrize(
    "idx,column",
    [
        ([1], "long"),
        ([1, 4], "long"),
        ([1, 4], "lat"),
        ([4], "lat"),
        ([3, 4], "lat"),
        ([3, 4], "long"),
        ([3], "long"),
        ([3, 6], "long"),
        ([6], "long"),
    ],
)
def test_location_outlier_eq_golden(spark, idx, column):
    other = "lat" if column == "long" else "long"

    def perturb(pdf):
        for i in idx:
            pdf.loc[i, column] = pdf.loc[i, other]

    assert _outlier_grid(spark, perturb) == set(idx)


@pytest.mark.parametrize(
    "idx,columns",
    [
        ([1, 4], ["long"]),
        ([1, 4], ["lat"]),
        ([1, 4], ["lat", "long"]),
        ([3, 4], ["lat"]),
        ([3, 4], ["long"]),
        ([3, 6], ["long"]),
        ([3, 6], ["long", "lat"]),
    ],
)
def test_location_outlier_zero_golden(spark, idx, columns):
    def perturb(pdf):
        for i, c in itertools.product(idx, columns):
            pdf.loc[i, c] = 0.0

    assert _outlier_grid(spark, perturb) == set(idx)


@pytest.mark.parametrize(
    "idx,dx,columns",
    [
        ([1, 4], 1, ["long"]),
        ([3, 4], 1, ["lat"]),
        ([3, 4], -0.1, ["long"]),
        ([3, 4], -0.1, ["lat", "long"]),
        ([3, 6], -1, ["lat"]),
    ],
)
def test_location_outlier_long_eq_lat_golden(spark, idx, dx, columns):
    def perturb(pdf):
        for i, c in itertools.product(idx, columns):
            pdf.loc[i, c] -= dx
            other = "lat" if c == "long" else "long"
            pdf.loc[i, other] = pdf.loc[i, c]

    assert _outlier_grid(spark, perturb) == set(idx)


# --------------------------------------------------- region flag fixture


def test_region_flags_golden(spark):
    """Reference ``test_qc_region_to_flag`` (``tests/test_qc.py:180-213``):
    null region ⇒ PROBABLY_BAD(3), contains MAINLAND ⇒ BAD(4), else the
    flag stays NO_QUALITY_CONTROL(0) — fixture order
    [NORTH SEA, MAINLAND EUROPE, MAINLAND random, None, NaN] × 2."""
    from qualityassurancetool_spark.operators.region import apply_region_checks

    regions = ["NORTH SEA", "MAINLAND EUROPE", "MAINLAND random", None, None] * 2
    expected = [0, 4, 4, 3, 3] * 2
    pdf = pd.DataFrame({"iot_id": range(10), "region": regions})
    df = spark.createDataFrame(pdf).withColumn(
        "qc_flag", F.lit(0).cast("tinyint")
    )
    out = (
        apply_region_checks(df)
        .orderBy("iot_id")
        .select("qc_flag")
        .toPandas()["qc_flag"]
        .tolist()
    )
    assert out == expected


# -------------------------------------------------- aums pivot/agg golden


def test_aums_agg_golden(spark, tmp_path):
    """End-to-end replay of the reference's aggregated export: shipped
    SensorThings response JSON → nested flatten → round/pivot/aggregate →
    value-for-value comparison against the shipped ``df_agg.csv`` golden at
    the reference's own rtol=0.01 (``tests/test_other.py:141-170``)."""
    from qualityassurancetool_spark.operators.pivot_export import (
        aggregate_pivot_export,
    )
    from qualityassurancetool_spark.sources.sta_json import (
        flatten_response,
        read_sta_response,
    )

    long_df = flatten_response(
        read_sta_response(spark, f"{RES}/aums_data_request_response.json")
    )
    streams = sorted(
        r[0] for r in long_df.select("datastream_id").distinct().collect()
    )
    wide = aggregate_pivot_export(long_df, stream_values=streams)
    got = wide.toPandas().set_index("ts_round").sort_index()

    ref = pd.read_csv(
        f"{RES}/df_agg.csv", header=list(range(6)), index_col=0
    )
    ref.index = pd.to_datetime(ref.index)
    # flatten the 6-level golden header to lat / long / {id}_result / {id}_flag
    cols = {}
    for c in ref.columns:
        if c[0] in ("lat", "long"):
            cols[c] = c[0]
        else:
            kind = "result" if c[1] == "result" else "flag"
            cols[c] = f"{c[0]}_{kind}"
    ref.columns = [cols[c] for c in ref.columns]

    assert len(got) == len(ref), (len(got), len(ref))
    assert list(got.index) == list(ref.index)

    np.testing.assert_allclose(got["lat"], ref["lat"], rtol=0.01)
    np.testing.assert_allclose(got["long"], ref["long"], rtol=0.01)
    for sid in streams:
        r_got = got[f"{sid}_result"].astype(float).to_numpy()
        r_ref = ref[f"{sid}_result"].astype(float).to_numpy()
        np.testing.assert_allclose(r_got, r_ref, rtol=0.01, equal_nan=True)
        f_got = got[f"{sid}_flag"].astype(float).to_numpy()
        f_ref = ref[f"{sid}_flag"].astype(float).to_numpy()
        np.testing.assert_allclose(f_got, f_ref, rtol=0, equal_nan=True)


# ------------------------------------------------ gradient fixture replay


def _grad_frame(spark, results, times_s):
    pdf = pd.DataFrame(
        {
            "iot_id": range(len(results)),
            "datastream_id": [0] * len(results),
            "phenomenon_time": [
                pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=float(s))
                for s in times_s
            ],
            "result": [float(r) for r in results],
        }
    )
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize(
    "result,ref",
    [
        ([0.0] * 10, [0.0] * 10),
        (list(range(0, 10)), [1.0] * 10),
        (list(range(10, 0, -1)), [-1.0] * 10),
    ],
)
def test_gradient_golden_basic(spark, result, ref):
    """Reference ``test_qc_gradient_calc_basic`` (``tests/test_qc.py:
    437-453``): uniform 1 s grid, constant/linear series — gradient is
    exactly 0 / +1 / −1 everywhere (np.gradient parity)."""
    from qualityassurancetool_spark.operators.gradient import calc_gradient

    df = _grad_frame(spark, result, range(10))
    got = (
        calc_gradient(df)
        .orderBy("iot_id")
        .select("gradient")
        .toPandas()["gradient"]
        .to_numpy()
    )
    np.testing.assert_allclose(got, np.array(ref, dtype=float), atol=1e-12)


@pytest.mark.parametrize(
    "result", [list(range(0, 10)), list(range(10, 0, -1))]
)
def test_gradient_golden_nonuniform_dt(spark, result):
    """Reference ``test_qc_gradient_cacl_vardt`` (``tests/test_qc.py:
    455-473``): time grid t_i = i² seconds — the non-uniform central
    difference must equal ``np.gradient(result, [i² ...])`` exactly."""
    from qualityassurancetool_spark.operators.gradient import calc_gradient

    times = [i * i for i in range(10)]
    df = _grad_frame(spark, result, times)
    got = (
        calc_gradient(df)
        .orderBy("iot_id")
        .select("gradient")
        .toPandas()["gradient"]
        .to_numpy()
    )
    want = np.gradient(np.array(result, dtype=float), np.array(times, float))
    np.testing.assert_allclose(got, want, rtol=1e-12)


# ------------------------------------- dependent-quantity fixture replay


def _dep_frame(spark, extra_stream_of=None):
    """The reference's ``df_testing`` shape for the dependent checks
    (``tests/test_qc.py:106-140``): streams 0/1 interleaved over 5
    shared seconds, iot_id 0..9, all flags GOOD; optionally append a
    copy of one stream as stream 10 (the 3-streams variants)."""
    base = pd.Timestamp("2024-01-01 12:00:00")
    pdf = pd.DataFrame(
        {
            "iot_id": range(10),
            "datastream_id": [0, 1] * 5,
            "phenomenon_time": [
                base + pd.Timedelta(seconds=s) for s in range(5)
                for _ in (0, 1)
            ],
            "result": [float(i) for i in range(10)],
        }
    )
    if extra_stream_of is not None:
        extra = pdf[pdf["datastream_id"] == extra_stream_of].copy()
        extra["datastream_id"] = 10
        extra["iot_id"] = extra["iot_id"] + 10
        pdf = pd.concat([pdf, extra], ignore_index=True)
    pdf["qc_flag"] = 1  # GOOD
    return pdf


def _flag_counts(spark, pdf, **kw):
    from qualityassurancetool_spark.operators.asof import (
        qc_dependent_quantity_base,
    )

    df = spark.createDataFrame(pdf).withColumn(
        "qc_flag", F.col("qc_flag").cast("tinyint")
    )
    out = qc_dependent_quantity_base(df, **kw)
    rows = out.select("qc_flag").toPandas()["qc_flag"].value_counts()
    return {int(k): int(v) for k, v in rows.items()}


@pytest.mark.parametrize("n", range(5))
def test_dependent_mismatch_golden(spark, n):
    """Reference ``test_qc_dependent_quantities_mismatch``
    (``tests/test_qc.py:682-703``): shift the n-th independent
    observation a day away — exactly its orphaned dependent flags BAD
    (the reference's default treats a missing match as BAD; this
    engine's knob spells it ``flag_when_missing``)."""
    pdf = _dep_frame(spark)
    idx = pdf.index[pdf["datastream_id"] == 0][n]
    pdf.loc[idx, "phenomenon_time"] += pd.Timedelta(days=1)
    counts = _flag_counts(
        spark, pdf,
        independent=0, dependent=1, dt_tolerance="0.5s",
        flag_when_missing=4,
    )
    assert counts == {1: 9, 4: 1}


@pytest.mark.parametrize("n", range(5))
def test_dependent_base_3streams_golden(spark, n):
    """Reference ``test_qc_dependent_quantities_base_3streams``
    (``tests/test_qc.py:706-730``): a third uninvolved stream rides
    along untouched; the BAD independent propagates to exactly its
    time-matched dependent — 2 BAD of 15."""
    pdf = _dep_frame(spark, extra_stream_of=1)
    idx = pdf.index[pdf["datastream_id"] == 0][n]
    pdf.loc[idx, "qc_flag"] = 4
    counts = _flag_counts(
        spark, pdf,
        independent=0, dependent=1, dt_tolerance="0.5s",
    )
    assert counts == {1: 13, 4: 2}


@pytest.mark.parametrize("n", range(5))
@pytest.mark.parametrize("n_rel_del", range(1, 5))
@pytest.mark.parametrize("independent_id,dependent_id", [(0, 1), (1, 0)])
def test_dependent_3streams_missing_golden(
    spark, n, n_rel_del, independent_id, dependent_id
):
    """Reference ``test_qc_dependent_quantities_base_3streams_missing``
    (``tests/test_qc.py:733-781``): one independent observation deleted
    AND another flagged BAD — the orphaned dependent flags BAD
    (flag_when_missing), the matched dependent inherits BAD, the set
    BAD stays: 3 BAD of 14."""
    pdf = _dep_frame(spark, extra_stream_of=dependent_id)
    ind_idx = pdf.index[pdf["datastream_id"] == independent_id]
    idx_bad = ind_idx[n]
    idx_del = ind_idx[(n + n_rel_del) % len(ind_idx)]
    pdf.loc[idx_bad, "qc_flag"] = 4
    pdf = pdf.drop(index=idx_del).reset_index(drop=True)
    counts = _flag_counts(
        spark, pdf,
        independent=independent_id, dependent=dependent_id,
        dt_tolerance="0.5s", flag_when_missing=4,
    )
    assert counts == {1: 11, 4: 3}


def test_velocity_golden_zero_dt_duplicate_timestamp(spark):
    """EXACT duplicate timestamps (dt == 0, common in real exports): a
    moved position in zero elapsed time is infinite velocity — pandas
    division gives +inf and the reference flags it; a 0-fill would pass
    it silently.  The unmoved duplicate (0 m / 0 s) follows the
    fillna(0) tail convention and stays clean."""
    from qualityassurancetool_spark.operators.geotrack import (
        apply_velocity_acceleration_check,
    )

    t = _velocity_track()
    # segment (3,4): same timestamp, different position -> inf velocity
    t.loc[4, "phenomenon_time"] = t.loc[3, "phenomenon_time"]
    df = spark.createDataFrame(
        t[["iot_id", "phenomenon_time", "lat", "long"]]
    ).withColumn("qc_flag", F.lit(None).cast("tinyint"))
    out = (
        apply_velocity_acceleration_check(
            df,
            max_velocity_ms=1e12,  # even an absurd bound: inf >= it
            max_acceleration_ms2=1e30,
            marking="reference",
            order_extra=["iot_id"],
        )
        .orderBy("iot_id")
        .select("qc_flag")
        .toPandas()["qc_flag"]
        .to_numpy()
    )
    flagged = set(np.nonzero(out == 3)[0].tolist())
    assert 3 in flagged

    # same timestamp AND same position: 0/0 -> fill-0 convention, clean
    t2 = _velocity_track()
    t2.loc[4, "phenomenon_time"] = t2.loc[3, "phenomenon_time"]
    t2.loc[4, "lat"] = t2.loc[3, "lat"]
    t2.loc[4, "long"] = t2.loc[3, "long"]
    df2 = spark.createDataFrame(
        t2[["iot_id", "phenomenon_time", "lat", "long"]]
    ).withColumn("qc_flag", F.lit(None).cast("tinyint"))
    out2 = (
        apply_velocity_acceleration_check(
            df2,
            max_velocity_ms=1e12,
            max_acceleration_ms2=1e30,
            marking="reference",
            order_extra=["iot_id"],
        )
        .orderBy("iot_id")
        .select("qc_flag")
        .toPandas()["qc_flag"]
        .to_numpy()
    )
    assert 3 not in set(np.nonzero(out2 == 3)[0].tolist())

"""Velocity/acceleration + spatial-outlier + region checks.

The velocity fixture follows the reference's construction
(tests/test_qc.py:32-47): points laid out by geodesic destination at known
distance/heading, expected velocity = distance/dt.  We verify haversine
agrees with the expected velocity to <0.5 % and that exceedance marks both
rows of the offending pair."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import QualityFlags
from qualityassurancetool_spark.functions.geo import EARTH_RADIUS_M, haversine_m
from qualityassurancetool_spark.operators.geotrack import (
    apply_velocity_acceleration_check,
    with_velocity_acceleration,
)
from qualityassurancetool_spark.operators.region import apply_region_checks
from qualityassurancetool_spark.operators.spatial_outlier import (
    apply_spatial_outlier_check,
)

T0 = dt.datetime(2023, 1, 1)


def ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def dest_point(lat, lon, distance_m, bearing_deg):
    """Great-circle destination (spherical Earth, same radius as engine)."""
    br = math.radians(bearing_deg)
    d = distance_m / EARTH_RADIUS_M
    lat1, lon1 = math.radians(lat), math.radians(lon)
    lat2 = math.asin(
        math.sin(lat1) * math.cos(d) + math.cos(lat1) * math.sin(d) * math.cos(br)
    )
    lon2 = lon1 + math.atan2(
        math.sin(br) * math.sin(d) * math.cos(lat1),
        math.cos(d) - math.sin(lat1) * math.sin(lat2),
    )
    return math.degrees(lat2), math.degrees(lon2)


def build_track(spark, steps_m, dt_s=2.0, lat0=51.37115902, lon0=3.18407097):
    lat, lon = lat0, lon0
    rows = [(0, lat, lon, ts(0.0))]
    for i, step in enumerate(steps_m, start=1):
        lat, lon = dest_point(lat, lon, step, 45.0)
        rows.append((i, lat, lon, ts(i * dt_s)))
    return spark.createDataFrame(
        rows, "iot_id long, lat double, long double, phenomenon_time timestamp"
    )


def test_haversine_known_distance(spark):
    # 1 degree of latitude ≈ 111.195 km on the sphere
    df = spark.createDataFrame([(50.0, 3.0, 51.0, 3.0)], "a double, b double, c double, d double")
    d = df.select(
        haversine_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
    ).collect()[0]["m"]
    assert d == pytest.approx(math.pi / 180 * EARTH_RADIUS_M, rel=1e-9)


def test_lambert_geodesic_accuracy(spark):
    """WGS-84 Lambert escape hatch (reference pins geopy geodesic):
    sub-meter at 1 degree, <10 m pole-to-equator — where haversine is off
    by 100 m – 5.6 km on the same cases."""
    from qualityassurancetool_spark.functions.geo import geodesic_m, lambert_m

    cases = [  # (lat1, lon1, lat2, lon2, WGS-84 geodesic meters)
        (0.0, 0.0, 1.0, 0.0, 110_574.4),     # meridian degree at equator
        (0.0, 0.0, 0.0, 1.0, 111_319.5),     # equatorial degree
        (0.0, 0.0, 90.0, 0.0, 10_001_965.7), # equator -> pole
        (50.0, 3.0, 50.0, 3.0, 0.0),         # coincident points
    ]
    df = spark.createDataFrame(
        cases, "lat1 double, lon1 double, lat2 double, lon2 double, t double"
    )
    out = df.select(
        "t",
        lambert_m(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("lam"),
        haversine_m(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("hav"),
        geodesic_m(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("auto"),
    ).collect()
    for r in out:
        assert abs(r["lam"] - r["t"]) < 10.0
        assert r["auto"] == pytest.approx(r["lam"])  # auto == lambert
        if r["t"] > 0:
            # the escape hatch must beat haversine wherever it matters
            assert abs(r["lam"] - r["t"]) < abs(r["hav"] - r["t"])


def test_velocity_matches_construction(spark):
    steps = [10.0, 10.0, 20.0, 40.0]  # meters per 2 s step
    df = build_track(spark, steps)
    out = (
        with_velocity_acceleration(df)
        .orderBy("iot_id")
        .select("dt_s", "velocity_ms", "acceleration_ms2")
        .collect()
    )
    assert out[0]["velocity_ms"] is None
    for i, step in enumerate(steps, start=1):
        assert out[i]["dt_s"] == pytest.approx(2.0)
        assert out[i]["velocity_ms"] == pytest.approx(step / 2.0, rel=5e-3)
    # acceleration row 3: (10 -> 20 m/2s) = (10-5)/2
    assert out[3]["acceleration_ms2"] == pytest.approx((10 - 5) / 2.0, rel=1e-2)


def test_velocity_exceedance_marks_both_rows(spark):
    steps = [10.0, 10.0, 500.0, 10.0]  # step 3 is a 250 m/s jump
    df = build_track(spark, steps).withColumn(
        "qc_flag", F.lit(1).cast("tinyint")
    )
    out = apply_velocity_acceleration_check(
        df, max_velocity_ms=50.0, max_acceleration_ms2=1e9
    )
    got = {r["iot_id"]: r["qc_flag"] for r in out.collect()}
    # pair (2,3) flagged: both endpoints of the offending segment
    assert got[2] == int(QualityFlags.PROBABLY_BAD)
    assert got[3] == int(QualityFlags.PROBABLY_BAD)
    assert got[0] == 1 and got[1] == 1 and got[4] == 1


def test_spatial_outlier_flags_injected_point(spark):
    # smooth 1 m steps with one 5 km excursion at row 10
    steps = [1.0] * 20
    df = build_track(spark, steps, dt_s=30.0)
    rows = df.collect()
    fixed = [
        (
            r["iot_id"],
            r["lat"] + (0.05 if r["iot_id"] == 10 else 0.0),
            r["long"],
            r["phenomenon_time"],
        )
        for r in rows
    ]
    df2 = spark.createDataFrame(
        fixed, "iot_id long, lat double, long double, phenomenon_time timestamp"
    ).withColumn("qc_flag", F.lit(1).cast("tinyint"))
    out = apply_spatial_outlier_check(
        df2, max_dx_dt=1.0, time_window="10min"
    )  # threshold = 600 m
    got = {r["iot_id"]: r["qc_flag"] for r in out.collect()}
    assert got[10] == int(QualityFlags.BAD)
    assert all(v == 1 for k, v in got.items() if k != 10)


def test_region_checks(spark):
    rows = [
        (0, "NORTH SEA", 1),
        (1, "MAINLAND EUROPE", 1),
        (2, "MAINLAND random", 1),
        (3, None, 1),
    ]
    df = spark.createDataFrame(rows, "iot_id long, region string, qc_flag tinyint")
    out = {r["iot_id"]: r["qc_flag"] for r in apply_region_checks(df).collect()}
    assert out == {0: 1, 1: 4, 2: 4, 3: 3}


def test_global_window_warning_on_file_backed_input(spark, tmp_path, caplog):
    """partition_cols=None on a many-file input is a silent
    single-partition sort at scale — the operator must warn (small
    createDataFrame fixtures stay quiet)."""
    import logging

    from qualityassurancetool_spark.operators.geotrack import (
        with_velocity_acceleration,
    )

    path = str(tmp_path / "track")
    spark.range(2000).select(
        F.col("id").alias("iot_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias(
            "phenomenon_time"
        ),
        (F.lit(51.0) + F.col("id") * 1e-5).alias("lat"),
        (F.lit(3.0) + F.col("id") * 1e-5).alias("long"),
    ).repartition(8).write.mode("overwrite").parquet(path)
    big = spark.read.parquet(path)

    with caplog.at_level(
        logging.WARNING, logger="qualityassurancetool_spark.operators.geotrack"
    ):
        with_velocity_acceleration(big)  # plan build alone must warn
    assert any("single-partition" in r.message for r in caplog.records)

    caplog.clear()
    small = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1), 51.0, 3.0)],
        "iot_id long, phenomenon_time timestamp, lat double, long double",
    )
    with caplog.at_level(
        logging.WARNING, logger="qualityassurancetool_spark.operators.geotrack"
    ):
        with_velocity_acceleration(small)
    assert not caplog.records

    caplog.clear()
    with caplog.at_level(
        logging.WARNING, logger="qualityassurancetool_spark.operators.geotrack"
    ):
        with_velocity_acceleration(big, partition_cols=["iot_id"])
    assert not caplog.records


def test_acceleration_convention_before_zero_dt_duplicate_pair(spark):
    """Pins THIS engine's convention for the acceleration edge the
    reference's shipped goldens do NOT cover (its velocity source lives
    in the unvendored ``pandassta`` package): at a row whose NEXT segment
    is a same-time same-position duplicate pair, the extended velocity of
    that pair is NULL (0 m / 0 s), so the preceding row's acceleration
    nulls out and 0-fills — it is NOT flagged.  The plausible alternative
    (fill v=0 before diffing, giving a = -v/dt there) WOULD flag it; this
    test exists so a refactor can't silently swap conventions."""
    import datetime as dtm

    from qualityassurancetool_spark.operators.geotrack import (
        apply_velocity_acceleration_check,
    )

    t0 = dtm.datetime(2024, 1, 1)
    rows = []
    # constant ~11 m/s northward track, 1 s cadence
    for i in range(5):
        rows.append((i, t0 + dtm.timedelta(seconds=i), 51.0 + i * 1e-4, 3.0))
    # row 5: duplicate timestamp AND position of row 4 (the 0/0 pair)
    rows.append((5, t0 + dtm.timedelta(seconds=4), 51.0 + 4 * 1e-4, 3.0))
    df = spark.createDataFrame(
        rows, "iot_id long, phenomenon_time timestamp, lat double, long double"
    ).withColumn("qc_flag", F.lit(None).cast("tinyint"))

    out = (
        apply_velocity_acceleration_check(
            df,
            max_velocity_ms=1e12,
            # |a| >= 5 would catch a fill-v=0-then-diff convention
            # (|-11 m/s / 1 s| = 11 >= 5) at row 3; ours nulls out
            max_acceleration_ms2=5.0,
            marking="reference",
            order_extra=["iot_id"],
        )
        .orderBy("iot_id")
        .select("qc_flag")
        .toPandas()["qc_flag"]
        .to_numpy()
    )
    import numpy as np

    assert set(np.nonzero(out == 3)[0].tolist()) == set()

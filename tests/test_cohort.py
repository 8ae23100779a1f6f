"""cohort_retention — acquisition-cohort activity grid."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.cohort import cohort_retention


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime.fromisoformat(ts)) for (u, ts) in rows],
        schema="user_id long, ts timestamp",
    )


def _grid(df):
    return {
        (str(r["cohort"]), r["period_offset"]): (
            r["active_users"],
            r["cohort_size"],
            r["retention_pct"],
        )
        for r in df.collect()
    }


def test_weekly_grid(spark):
    # 2024-01-01 is a Monday. u1,u2 start week 0; u2 returns week 1;
    # u1 returns week 2; u3 starts week 1.
    ev = _ev(
        spark,
        [
            (1, "2024-01-01T10:00"),
            (2, "2024-01-03T10:00"),
            (2, "2024-01-09T10:00"),
            (1, "2024-01-16T10:00"),
            (3, "2024-01-10T10:00"),
        ],
    )
    g = _grid(cohort_retention(ev, period="week"))
    assert g[("2024-01-01", 0)] == (2, 2, 100.0)
    assert g[("2024-01-01", 1)] == (1, 2, 50.0)
    assert g[("2024-01-01", 2)] == (1, 2, 50.0)
    assert g[("2024-01-08", 0)] == (1, 1, 100.0)
    assert len(g) == 4


def test_multiple_events_same_period_count_once(spark):
    ev = _ev(
        spark,
        [
            (1, "2024-01-01T10:00"),
            (1, "2024-01-02T10:00"),
            (1, "2024-01-03T10:00"),
        ],
    )
    g = _grid(cohort_retention(ev, period="week"))
    assert g == {("2024-01-01", 0): (1, 1, 100.0)}


def test_daily_and_monthly(spark):
    ev = _ev(
        spark,
        [
            (1, "2024-01-01T10:00"),
            (1, "2024-01-03T10:00"),
            (2, "2024-02-15T10:00"),
            (2, "2024-04-01T10:00"),
        ],
    )
    gd = _grid(cohort_retention(ev, period="day"))
    assert gd[("2024-01-01", 2)] == (1, 1, 100.0)
    gm = _grid(cohort_retention(ev, period="month"))
    assert gm[("2024-02-01", 0)] == (1, 1, 100.0)
    assert gm[("2024-02-01", 2)] == (1, 1, 100.0)


def test_null_ts_ignored_and_validation(spark):
    ev = _ev(spark, [(1, "2024-01-01T10:00")]).union(
        _ev(spark, [(2, "2024-01-01T00:00")]).withColumn(
            "ts", F.lit(None).cast("timestamp")
        )
    )
    g = _grid(cohort_retention(ev))
    assert list(g) == [("2024-01-01", 0)]
    with pytest.raises(ValueError):
        cohort_retention(ev, period="fortnight")


def test_offset_zero_always_full(spark):
    ev = _ev(
        spark,
        [(u, f"2024-01-{1 + (u % 21):02d}T00:00") for u in range(40)]
        + [(u, f"2024-02-{1 + (u % 28):02d}T00:00") for u in range(0, 40, 3)],
    )
    df = cohort_retention(ev, period="week")
    zero = df.where(F.col("period_offset") == 0)
    assert (
        zero.where(
            F.col("active_users") != F.col("cohort_size")
        ).count()
        == 0
    )
    assert (
        df.where(F.col("retention_pct") > 100.0).count() == 0
    )

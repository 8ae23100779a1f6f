"""Embargoed temporal split (operators/sampling.split_by_time).
Cross-engine parity: tools/extra_oracles.py::x_time_split."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.sampling import split_by_time


def _df(spark, times):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(times)], ["id", "ts"]
    )


def test_boundaries_and_embargo(spark):
    T = dt.datetime(2024, 6, 1)
    times = [
        T - dt.timedelta(days=1),        # train
        T - dt.timedelta(microseconds=1),  # train (strictly before)
        T,                               # embargo starts AT train_end
        T + dt.timedelta(hours=47),      # still embargo (48h)
        T + dt.timedelta(hours=48),      # test starts at embargo end
        T + dt.timedelta(days=30),       # test
        None,                            # null ts → null split
    ]
    got = {
        r["id"]: r["split"]
        for r in split_by_time(
            _df(spark, times), "ts", "2024-06-01 00:00:00",
            embargo="48 hours",
        ).collect()
    }
    assert got == {
        0: "train", 1: "train", 2: "embargo", 3: "embargo",
        4: "test", 5: "test", 6: None,
    }


def test_bounded_test_window_and_zero_embargo(spark):
    T = dt.datetime(2024, 6, 1)
    times = [T - dt.timedelta(days=1), T, T + dt.timedelta(days=10)]
    got = {
        r["id"]: r["split"]
        for r in split_by_time(
            _df(spark, times), "ts", "2024-06-01 00:00:00",
            test_end="2024-06-05 00:00:00",
        ).collect()
    }
    # zero embargo: test starts immediately; day+10 is past test_end
    assert got == {0: "train", 1: "test", 2: None}

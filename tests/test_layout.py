"""Landing-layout tests: partition pruning actually prunes (files and
plan), writes are one file per day, and window reads round-trip."""

import datetime as dt
import os

from pyspark.sql import functions as F

from qualityassurancetool_spark.schema import events_as_observations
from qualityassurancetool_spark.sources.layout import (
    read_observations_window,
    write_observations_landing,
)

SF_DIR = "/root/testdata/sf0.001"


def test_landing_layout_prunes_partitions_and_row_groups(spark, tmp_path):
    path = str(tmp_path / "landing")
    obs = events_as_observations(spark, SF_DIR)
    write_observations_landing(obs, path)

    # layout: hive-style date dirs, ONE data file per day (repartition by
    # the partition column upstream of the writer)
    days = sorted(d for d in os.listdir(path) if d.startswith("obs_date="))
    assert len(days) > 5
    for d in days[:3]:
        files = [
            f
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)

    # pick a 1-day window in the middle of the range
    lo_hi = obs.agg(
        F.min("phenomenon_time"), F.max("phenomenon_time")
    ).head()
    start = (lo_hi[0] + dt.timedelta(days=3)).replace(
        hour=0, minute=0, second=0, microsecond=0
    )
    end = start + dt.timedelta(days=1)
    win = read_observations_window(spark, path, start, end)

    # plan-level: the date predicate reached PartitionFilters (pre-I/O),
    # the ts predicate reached PushedFilters (row-group stats)
    plan = win._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "obs_date" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0]
    assert "PushedFilters: [" in plan and "phenomenon_time" in plan.split(
        "PushedFilters: ["
    )[1].split("]")[0]

    # correctness: matches a plain filter over the original table
    want = obs.where(
        (F.col("phenomenon_time") >= F.lit(start))
        & (F.col("phenomenon_time") < F.lit(end))
    ).count()
    assert win.count() == want
    assert want > 0

    # behavioral proof of pruning: corrupt every data file OUTSIDE the
    # window's days — the pruned read must still succeed (it never opens
    # them), while a full-table scan fails on the junk bytes
    landing_schema = spark.read.parquet(path).schema  # captured pre-corruption
    keep = {f"obs_date={start.date()}", f"obs_date={end.date()}"}
    for d in days:
        if d in keep:
            continue
        ddir = os.path.join(path, d)
        for f in os.listdir(ddir):
            if f.endswith(".parquet"):
                with open(os.path.join(ddir, f), "wb") as fh:
                    fh.write(b"not a parquet file")
    rewin = read_observations_window(
        spark, path, start, end, schema=landing_schema
    )
    assert rewin.count() == want

    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.parquet(path).count()


def test_landing_rerun_overwrites_only_incoming_days(spark, tmp_path):
    path = str(tmp_path / "landing2")
    obs = events_as_observations(spark, SF_DIR)
    write_observations_landing(obs, path)
    days = sorted(d for d in os.listdir(path) if d.startswith("obs_date="))
    first_day = days[0].split("=")[1]
    other_day = days[1]
    other_files_before = set(os.listdir(os.path.join(path, other_day)))

    # re-land only the first day (the overlap re-run)
    redo = obs.where(F.to_date("phenomenon_time") == F.lit(first_day))
    write_observations_landing(redo, path)

    # untouched day's files are byte-identical (same names)
    assert set(os.listdir(os.path.join(path, other_day))) == other_files_before
    # and the re-landed table still reads complete
    assert spark.read.parquet(path).count() == obs.count()


def test_compact_dataset(spark, tmp_path):
    """Many tiny appended files collapse to a handful; data multiset
    survives; input is never destroyed mid-flight (staging swap)."""
    import os

    from qualityassurancetool_spark.sources.layout import compact_dataset

    path = str(tmp_path / "landing")
    for batch in range(10):
        spark.createDataFrame(
            [(batch * 100 + i, f"v{batch}-{i}") for i in range(50)],
            "id long, v string",
        ).repartition(8).write.mode("append").parquet(path)
    before = spark.read.parquet(path)
    n_rows = before.count()
    rows_before = sorted((r["id"], r["v"]) for r in before.collect())

    report = compact_dataset(spark, path, target_file_mb=64)
    assert report["files_before"] >= 80
    assert report["files_after"] <= 4
    after = spark.read.parquet(path)
    assert after.count() == n_rows
    assert sorted((r["id"], r["v"]) for r in after.collect()) == rows_before
    assert not os.path.exists(path + ".compact-staging")
    assert not os.path.exists(path + ".compact-old")

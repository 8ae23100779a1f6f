"""load_table / events_as_observations resolved-PLAN memo (round-11):
repeated loads of one (app, sf_dir, table) return the same DataFrame
object — skipping per-call DataSource re-resolution — while actions
still scan the parquet files (no data/result caching)."""

from qualityassurancetool_spark.schema import (
    _PLAN_CACHE,
    events_as_observations,
    load_table,
)

SF = "/root/testdata/sf0.001"


def test_same_object_per_dir_and_table(spark):
    a = load_table(spark, SF, "lineitem")
    b = load_table(spark, SF, "lineitem")
    assert a is b
    c = load_table(spark, SF, "orders")
    assert c is not a
    o1 = events_as_observations(spark, SF)
    o2 = events_as_observations(spark, SF)
    assert o1 is o2


def test_memo_is_plan_only_not_results(spark):
    """The memo holds the resolved READER PLAN, never data or results:
    the frame is not persisted at any storage level and its physical
    plan is a parquet FileScan (not an InMemoryTableScan) — every
    action re-reads the files.  (File LISTINGS are snapshotted at
    resolution, per the documented same-session immutability
    assumption — the one Spark's own FileStatusCache makes.)"""
    df = load_table(spark, SF, "lineitem")
    assert load_table(spark, SF, "lineitem") is df
    assert df.storageLevel.useMemory is False
    assert df.storageLevel.useDisk is False
    phys = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "InMemoryTableScan" not in phys
    assert "FileScan parquet" in phys
    # two actions, two real scans: both agree and return live data
    assert df.count() == df.select("l_orderkey").count()


def test_cache_keyed_on_application(spark):
    load_table(spark, SF, "region")
    assert _PLAN_CACHE["app"] == spark.sparkContext.applicationId
    assert (SF, "region") in _PLAN_CACHE["tables"]

"""Approximate-aggregate (sketch) surface: HyperLogLog distinct counts and
t-digest-style quantiles.  The reference has none of these (SURVEY §2.4
"not present"), but a 100 TB engine needs the sketch path — an exact
distinct over billions of user ids shuffles every id, while
``approx_count_distinct`` ships one fixed-size HLL register set per
partition (map-side combinable, memory O(2^p) regardless of cardinality).

No cross-engine oracle exists for sketch internals (register layouts are
engine-specific), so these are accuracy-bound tests against the exact
answer computed in the same session — the correctness contract an
approximate operator actually offers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qualityassurancetool_spark.schema import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_hll_distinct_within_rsd(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select(F.countDistinct("user_id").alias("d")).head()["d"]
    # default rsd 0.05; assert the documented bound with headroom (3 sigma)
    approx = ev.select(
        F.approx_count_distinct("user_id").alias("d")
    ).head()["d"]
    assert abs(approx - exact) <= max(3, 0.15 * exact)

    # tighter rsd must not be further off than the loose one's bound
    approx_tight = ev.select(
        F.approx_count_distinct("user_id", rsd=0.01).alias("d")
    ).head()["d"]
    assert abs(approx_tight - exact) <= max(3, 0.03 * exact)


def test_hll_partial_merge_equals_single_pass(spark):
    """The property that makes HLL scale: sketching each partition and
    merging must equal sketching everything at once — grouped sketches
    unioned across a repartition give the same estimate."""
    ev = load_table(spark, SF_DIR, "events")
    one_pass = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("d")
    ).head()["d"]
    two_phase = (
        ev.repartition(32)
        .select(F.approx_count_distinct("user_id", rsd=0.02).alias("d"))
        .head()["d"]
    )
    # deterministic hashing => identical registers regardless of
    # partitioning/merge order
    assert one_pass == two_phase


def test_approx_percentile_within_rank_error(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    n = li.count()
    acc = 10_000  # rank error <= n / acc
    got = li.select(
        F.percentile_approx("l_extendedprice", 0.5, acc).alias("p50")
    ).head()["p50"]
    # translate value back to rank and assert the documented rank bound
    rank = li.where(F.col("l_extendedprice") <= got).count()
    assert abs(rank - 0.5 * n) <= max(1, n / acc) + 1

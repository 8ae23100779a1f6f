"""As-of join + dependent-quantity matrix, transliterating the reference's
test families (tests/test_qc.py:604-971): flag propagation, 1-day shift ⇒
no match, missing partner ⇒ flag_when_missing, third stream untouched."""

import datetime as dt

import pytest

from qualityassurancetool_spark.flags import QualityFlags
from qualityassurancetool_spark.operators.asof import (
    asof_nearest_join,
    qc_dependent_quantity_base,
    qc_dependent_quantity_secondary,
)

T0 = dt.datetime(2023, 1, 1)
SCHEMA = (
    "iot_id long, result double, phenomenon_time timestamp, "
    "qc_flag tinyint, datastream_id long"
)


def ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def two_streams(spark, n=5, jitter=0.1, flags=None):
    """independent stream 0 at t=i s; dependent stream 1 at t=i+jitter s."""
    flags = flags or {}
    rows = []
    for i in range(n):
        rows.append((i, float(i), ts(i), flags.get(i, 1), 0))
    for i in range(n):
        rid = n + i
        rows.append((rid, float(i) * 10, ts(i + jitter), flags.get(rid, 1), 1))
    return spark.createDataFrame(rows, SCHEMA)


def flag_counts(df):
    out = {}
    for r in df.groupBy("qc_flag").count().collect():
        out[r["qc_flag"]] = r["count"]
    return out


@pytest.mark.parametrize("n", range(5))
def test_dependent_base_propagates_bad(spark, n):
    df = two_streams(spark, flags={n: 4})
    out = qc_dependent_quantity_base(df, independent=0, dependent=1)
    assert flag_counts(out) == {1: 8, 4: 2}


@pytest.mark.parametrize("n", range(5))
def test_dependent_base_shifted_no_match(spark, n):
    # shift independent row n by 1 day: its dependent partner no longer
    # matches; without flag_when_missing the dependent stays GOOD
    df = two_streams(spark, flags={n: 4})
    rows = df.collect()
    newrows = [
        (
            r["iot_id"],
            r["result"],
            r["phenomenon_time"] + dt.timedelta(days=1)
            if r["iot_id"] == n
            else r["phenomenon_time"],
            r["qc_flag"],
            r["datastream_id"],
        )
        for r in rows
    ]
    df2 = spark.createDataFrame(newrows, SCHEMA)
    out = qc_dependent_quantity_base(df2, independent=0, dependent=1)
    assert flag_counts(out) == {1: 9, 4: 1}


@pytest.mark.parametrize("n", range(5))
def test_dependent_base_missing_partner_flagged(spark, n):
    # remove independent row n entirely; its dependent is unmatched and
    # gets flag_when_missing=BAD; plus one other independent marked BAD
    # propagates — reference 3-streams-missing family expects 3 BAD
    mark = (n + 1) % 5
    df = two_streams(spark, flags={mark: 4})
    df2 = df.where(~((df.datastream_id == 0) & (df.iot_id == n)))
    out = qc_dependent_quantity_base(
        df2, independent=0, dependent=1, flag_when_missing=QualityFlags.BAD
    )
    assert flag_counts(out) == {1: 6, 4: 3}


def test_third_stream_untouched(spark):
    df = two_streams(spark, flags={0: 4})
    extra = spark.createDataFrame(
        [(100, 1.0, ts(0), 1, 10), (101, 2.0, ts(1), 1, 10)], SCHEMA
    )
    out = qc_dependent_quantity_base(
        df.unionByName(extra), independent=0, dependent=1
    )
    got = {
        r["iot_id"]: r["qc_flag"]
        for r in out.where(out.datastream_id == 10).collect()
    }
    assert got == {100: 1, 101: 1}


def test_dependent_secondary_value_range(spark):
    # independent values 0..4; range (0.5, 3.5) strict ⇒ ind rows 0 and 4
    # out of range ⇒ their matched dependents flagged BAD (flags not linked)
    df = two_streams(spark)
    out = qc_dependent_quantity_secondary(
        df, independent=0, dependent=1, range_=(0.5, 3.5)
    )
    dep = {
        r["iot_id"]: r["qc_flag"]
        for r in out.where(out.datastream_id == 1).collect()
    }
    assert dep == {5: 4, 6: 1, 7: 1, 8: 1, 9: 4}
    ind = {
        r["iot_id"]: r["qc_flag"]
        for r in out.where(out.datastream_id == 0).collect()
    }
    assert set(ind.values()) == {1}  # independent flags untouched


def test_asof_nearest_picks_nearest(spark):
    dep = spark.createDataFrame(
        [(1, ts(10.0))], "iot_id long, phenomenon_time timestamp"
    )
    ind = spark.createDataFrame(
        [(100, ts(9.8)), (101, ts(10.1)), (102, ts(10.4))],
        "iot_id long, phenomenon_time timestamp",
    )
    out = asof_nearest_join(dep, ind, tolerance=0.5).collect()
    assert len(out) == 1
    assert out[0]["ind_iot_id"] == 101


def test_asof_unmatched_survives_even_with_neighbors_out_of_tol(spark):
    # independent rows exist in adjacent buckets but all beyond tolerance:
    # the dependent must survive as unmatched (regression guard)
    dep = spark.createDataFrame(
        [(1, ts(10.0))], "iot_id long, phenomenon_time timestamp"
    )
    ind = spark.createDataFrame(
        [(100, ts(9.0)), (101, ts(10.9))],
        "iot_id long, phenomenon_time timestamp",
    )
    out = asof_nearest_join(dep, ind, tolerance=0.5).collect()
    assert len(out) == 1
    assert out[0]["ind_iot_id"] is None


def test_materialize_flag_is_result_identical(spark):
    # materialize=True (the 100 TB setting: lazy localCheckpoint before
    # the three-branch split) must not change a single row or flag
    df = two_streams(spark, n=6, flags={2: 4, 8: 3})
    kw = dict(independent=0, dependent=1, dt_tolerance=0.5,
              flag_when_missing=2)
    plain = qc_dependent_quantity_base(df, materialize=False, **kw)
    ckpt = qc_dependent_quantity_base(df, materialize=True, **kw)
    key = lambda r: r["iot_id"]
    assert sorted(plain.collect(), key=key) == sorted(ckpt.collect(), key=key)

    plain2 = qc_dependent_quantity_secondary(
        plain, independent=0, dependent=1, range_=(0.5, 3.5),
        materialize=False)
    ckpt2 = qc_dependent_quantity_secondary(
        ckpt, independent=0, dependent=1, range_=(0.5, 3.5),
        materialize=True)
    assert sorted(plain2.collect(), key=key) == sorted(ckpt2.collect(), key=key)


# ---- window-strategy (single-pass) as-of ----------------------------------


@pytest.mark.parametrize("strategy", ["join", "window"])
@pytest.mark.parametrize("fwm", [None, 2])
def test_strategy_matrix_identical(spark, strategy, fwm):
    df = two_streams(spark, flags={2: 4, 8: 3})
    out = qc_dependent_quantity_base(
        df, independent=0, dependent=1, flag_when_missing=fwm,
        strategy=strategy,
    )
    base = qc_dependent_quantity_base(
        df, independent=0, dependent=1, flag_when_missing=fwm,
    )
    key = lambda r: r["iot_id"]
    assert sorted(out.collect(), key=key) == sorted(base.collect(), key=key)


def test_window_strategy_equidistant_tie_prefers_earlier(spark):
    from pyspark.sql import functions as F
    from qualityassurancetool_spark.operators.asof import asof_nearest_context

    # dependent row at t=10; candidates at t=8 and t=12 (both |dt|=2):
    # earlier timestamp must win, matching asof_nearest_join's ordering
    rows = [
        (1, 0.0, ts(8), 4, 0),
        (2, 0.0, ts(12), 3, 0),
        (3, 0.0, ts(10), 1, 1),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    ann = asof_nearest_context(
        df, is_candidate=F.col("datastream_id") == 0, tolerance="5s",
        payload_cols=["qc_flag"],
    )
    got = {r["iot_id"]: r["_asof"] for r in ann.collect()}
    assert got[3]["qc_flag"] == 4  # t=8 candidate, not t=12


def test_window_strategy_same_ts_tie_prefers_smaller_id(spark):
    from pyspark.sql import functions as F
    from qualityassurancetool_spark.operators.asof import asof_nearest_context

    rows = [
        (7, 0.0, ts(9), 4, 0),
        (5, 0.0, ts(9), 3, 0),   # same instant, smaller id wins
        (9, 0.0, ts(10), 1, 1),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    ann = asof_nearest_context(
        df, is_candidate=F.col("datastream_id") == 0, tolerance="5s",
        payload_cols=["qc_flag"],
    )
    got = {r["iot_id"]: r["_asof"] for r in ann.collect()}
    assert got[9]["qc_flag"] == 3


def test_window_strategy_halo_across_bucket_edges(spark):
    from pyspark.sql import functions as F
    from qualityassurancetool_spark.operators.asof import asof_nearest_context

    # tiny bucket (== tolerance) forces every match to cross a bucket
    # boundary; nearest must still be found on both sides
    rows = [
        (1, 0.0, ts(0.4), 4, 0),
        (2, 0.0, ts(3.6), 3, 0),
        (10, 0.0, ts(1.1), 1, 1),   # nearest: t=0.4 (dt 0.7) vs 3.6 (2.5)
        (11, 0.0, ts(2.9), 1, 1),   # nearest: t=3.6 (dt 0.7) vs 0.4 (2.5)
        (12, 0.0, ts(9.0), 1, 1),   # nothing within 1s
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    ann = asof_nearest_context(
        df, is_candidate=F.col("datastream_id") == 0, tolerance="1s",
        payload_cols=["qc_flag"], bucket="1s",
    )
    got = {r["iot_id"]: r["_asof"] for r in ann.collect()}
    assert got[10]["qc_flag"] == 4
    assert got[11]["qc_flag"] == 3
    assert got[12] is None


def test_salted_asof_identical_output(spark):
    """salt=R replicates dependent rows across R sub-keys and salts the
    independent side — the nearest-pick fold over _dep_row makes the
    output identical, matched and unmatched rows alike."""
    import datetime as dt

    from pyspark.sql import functions as F

    from qualityassurancetool_spark.operators.asof import asof_nearest_join

    base = dt.datetime(2024, 1, 1)
    dep = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=7 * i)) for i in range(200)]
        # far future: provably unmatched rows (the left-join null path)
        + [(900 + i, base + dt.timedelta(days=30 + i)) for i in range(5)],
        "iot_id long, phenomenon_time timestamp",
    )
    # burst: half the independent rows inside one 30-s bucket
    ind = spark.createDataFrame(
        [
            (1000 + i,
             base + dt.timedelta(seconds=(i % 30) if i % 2 == 0 else 11 * i),
             float(i))
            for i in range(300)
        ],
        "iot_id long, phenomenon_time timestamp, result double",
    )
    plain = asof_nearest_join(dep, ind, "30s").collect()
    salted = asof_nearest_join(dep, ind, "30s", salt=8).collect()
    key = lambda r: r["iot_id"]  # noqa: E731
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
    # sanity: some matched, some unmatched
    matched = [r for r in plain if r["ind_iot_id"] is not None]
    assert 0 < len(matched) < len(plain)
    with __import__("pytest").raises(ValueError, match="salt"):
        asof_nearest_join(dep, ind, "30s", salt=1)

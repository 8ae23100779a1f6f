"""Sensor stabilization / downtime flagging (reference ``limit_value_fctn``,
``src/main.py:158-192``; golden frame ``tests/test_qc.py:542-601``).

The reference runs this as a grouped-map pandas apply; here it is a pure
window-expression pipeline (W1–W4: diff, cumsum, conditional forward-fill,
gaps-and-islands) so Catalyst sees one plan and the whole thing is two
window passes over a single shuffle on the stream key.

Derived columns (golden-test names, all in *seconds* as doubles):

- ``within_limits``: strict range predicate (row is "up")
- ``dt``:        seconds since previous row (first row 0)
- ``cumsum``:    running sum of dt (elapsed seconds since group start)
- ``time_down``: elapsed since the last "up" row (first row pinned to 0)
- ``time_up_since``: elapsed since the last downtime-exceedance
  (first row pinned to 0)
- ``block_id``:  consecutive-run id over within_limits (1-based)
- ``max_downtime``: max time_down within a "down" block, 0 in "up" blocks
- flag: BAD while ``time_up_since < dt_stabilization`` else NO_QC
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import QualityFlags, flag_from_bool
from qualityassurancetool_spark.functions.timeutils import epoch_micros


def apply_stabilization(
    df: DataFrame,
    value_col: str = "result",
    ts_col: str = "phenomenon_time",
    group_cols: list[str] | None = None,
    min_col: str = "qc_range_min",
    max_col: str = "qc_range_max",
    max_allowed_downtime_col: str = "max_allowed_downtime",
    dt_stabilization_col: str = "dt_stabilization",
    flag_col: str = "stabilization_flag",
    keep_intermediate: bool = True,
    strategy: str = "window",
) -> DataFrame:
    groups = group_cols or ["datastream_id"]
    if strategy == "bucketed":
        from qualityassurancetool_spark.operators.partitioned_windows import (
            apply_stabilization_bucketed,
        )

        return apply_stabilization_bucketed(
            df,
            value_col=value_col,
            ts_col=ts_col,
            group_cols=groups,
            min_col=min_col,
            max_col=max_col,
            max_allowed_downtime_col=max_allowed_downtime_col,
            dt_stabilization_col=dt_stabilization_col,
            flag_col=flag_col,
            keep_intermediate=keep_intermediate,
        )
    if strategy != "window":
        raise ValueError(f"unknown strategy {strategy!r} (window|bucketed)")
    # "no timestamp, no stats": NULL-ts rows get NULL time-derived columns
    # and a NULL flag in both strategies (within_limits stays row-local);
    # they must not participate in dt/cumsum or shift block numbering
    within_expr = (F.col(value_col) > F.col(min_col)) & (
        F.col(value_col) < F.col(max_col)
    )
    null_ts = df.where(F.col(ts_col).isNull()).withColumns(
        {
            "within_limits": within_expr,
            "dt": F.lit(None).cast("double"),
            "cumsum": F.lit(None).cast("double"),
            "time_down": F.lit(None).cast("double"),
            "time_up_since": F.lit(None).cast("double"),
            "block_id": F.lit(None).cast("long"),
            "max_downtime": F.lit(None).cast("double"),
            flag_col: F.lit(None).cast("tinyint"),
        }
    )
    df = df.where(F.col(ts_col).isNotNull())
    w = Window.partitionBy(*groups).orderBy(ts_col)
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    t_us = epoch_micros(ts_col)
    within = (F.col(value_col) > F.col(min_col)) & (
        F.col(value_col) < F.col(max_col)
    )
    is_first = F.row_number().over(w) == 1

    # dependency chain: within/dt → cumsum → time_down → (time_up_since,
    # block_id) → (max_downtime, flag).  Independent columns share a
    # withColumns call — 5 plan-analysis passes instead of 8 (each pass
    # re-analyzes the whole growing plan, so this is a build-time win on
    # long chains).
    df = df.withColumns(
        {
            "within_limits": within,
            "dt": F.coalesce(
                (t_us - F.lag(t_us).over(w)) / F.lit(1_000_000.0), F.lit(0.0)
            ),
        }
    )
    df = df.withColumn("cumsum", F.sum("dt").over(w_cum))

    # time_down: cumsum − ffill(cumsum where within); row 0 of the group is
    # force-seeded to 0 (reference ``tmp_down.iloc[0] = 0``)
    tmp_down = F.when(is_first, F.lit(0.0)).when(
        F.col("within_limits"), F.col("cumsum")
    )
    df = df.withColumn(
        "time_down",
        F.col("cumsum") - F.last(tmp_down, ignorenulls=True).over(w_cum),
    )

    # time_up_since: cumsum − ffill(cumsum where downtime exceeded); seeded 0
    tmp_up = F.when(is_first, F.lit(0.0)).when(
        F.col("time_down") > F.col(max_allowed_downtime_col), F.col("cumsum")
    )
    # gaps-and-islands block id (1-based like pandas' cumsum-of-changes)
    changed = F.when(
        F.lag("within_limits").over(w).isNull()
        | (F.col("within_limits") != F.lag("within_limits").over(w)),
        F.lit(1),
    ).otherwise(F.lit(0))
    df = df.withColumns(
        {
            "time_up_since": F.col("cumsum")
            - F.last(tmp_up, ignorenulls=True).over(w_cum),
            "block_id": F.sum(changed).over(w_cum),
        }
    )

    w_block = Window.partitionBy(*groups, "block_id")
    df = df.withColumns(
        {
            "max_downtime": F.when(
                F.col("within_limits"), F.lit(0.0)
            ).otherwise(F.max("time_down").over(w_block)),
            flag_col: flag_from_bool(
                F.col("time_up_since") < F.col(dt_stabilization_col),
                flag_on_true=QualityFlags.BAD,
                flag_on_false=QualityFlags.NO_QUALITY_CONTROL,
            ),
        }
    )
    df = df.unionByName(null_ts)
    if not keep_intermediate:
        df = df.drop(
            "within_limits",
            "dt",
            "cumsum",
            "time_down",
            "time_up_since",
            "block_id",
            "max_downtime",
        )
    return df

"""Sessionization — gaps-and-islands over per-entity event streams.

The reference's gaps-and-islands pattern (W4, ``(b != b.shift()).cumsum()``
at reference ``src/main.py:176-178``) generalized to the training-pipeline
scale op: split each user's event stream into sessions wherever the gap to
the previous event exceeds a threshold, then aggregate per session.

Scale shape: one shuffle on the entity key (users/devices/docs — high
cardinality, the natural partition key), one per-partition sort, then the
session aggregation reuses the same partitioning (groupBy on a superset
of the window's partition key ⇒ no second exchange of the full data).
All integer epoch-microsecond arithmetic — exact and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.timeutils import (
    epoch_micros,
    parse_timedelta_seconds,
)


def with_session_ids(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str | float = "30min",
    order_extra: list[str] | None = None,
    session_col: str = "session_idx",
) -> DataFrame:
    """Add a per-entity session ordinal (1-based): a new session starts at
    the first event and wherever ``ts - prev_ts > gap``.

    ``order_extra`` breaks ties between equal timestamps (pass a unique id
    column for full determinism).
    """
    gap_us = int(parse_timedelta_seconds(gap) * 1_000_000)
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_extra or [])
    ]
    w = Window.partitionBy(entity_col).orderBy(*order)
    t_us = epoch_micros(ts_col)
    is_break = (
        F.when(t_us - F.lag(t_us).over(w) > gap_us, F.lit(1))
        .otherwise(F.lit(0))
    )
    cum = Window.partitionBy(entity_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # first row per entity: lag is null -> is_break 0; +1 makes ids 1-based
    return df.withColumn(
        session_col, (F.sum(is_break).over(cum) + F.lit(1)).cast("long")
    )


def session_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str | float = "30min",
    order_extra: list[str] | None = None,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Per-session aggregate: event count, start (epoch µs), duration in
    seconds.  One shuffle total — the groupBy keys contain the window's
    partition key, so the aggregation is partial-agg + reuse-partitioning.
    """
    t_us = epoch_micros(ts_col)
    sess = with_session_ids(df, entity_col, ts_col, gap, order_extra)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(t_us).alias("session_start_us"),
        ((F.max(t_us) - F.min(t_us)) / F.lit(1_000_000.0)).alias(
            "duration_sec"
        ),
    ] + list(extra_aggs or [])
    return sess.groupBy(entity_col, "session_idx").agg(*aggs)

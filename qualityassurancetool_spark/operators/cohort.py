"""Cohort retention — the classic acquisition-cohort activity grid.

Each user is assigned to the cohort of the period (week/month/day)
containing their FIRST event; for every later period in which they
are active they contribute to that cohort's retention cell.  Output
is the long-format grid ``(cohort, period_offset, active_users)``
plus each cohort's size and retention percentage — the table every
retention chart is drawn from.

Scale shape: ONE shuffle on the user key computes the per-user first
timestamp as a partition-wide window aggregate (no orderBy — no sort,
just a hash exchange Catalyst reuses for the per-user distinct that
follows), then the (cohort, offset) aggregation reduces to at most
cohorts × offsets rows — driver-trivial output no matter the input
size.  Offsets are computed by integer day arithmetic on the
truncated period starts, so week semantics are engine-portable
(Spark and DuckDB both truncate weeks to ISO Mondays, and the
day-difference divided by the period length sidesteps both engines'
boundary-crossing date_diff quirks).

Reference scope: no cohort operator exists in the reference; this is
part of the events-table analytics surface the Spark engine adds
(same family as ``operators/sessionize.py`` and
``operators/funnel.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_PERIOD_DAYS = {"day": 1, "week": 7}


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Long-format retention grid.

    Returns ``(cohort, period_offset, active_users, cohort_size,
    retention_pct)`` where ``cohort`` is the period-start DATE of the
    user's first event, ``period_offset`` counts whole periods from
    the cohort period (0 = the acquisition period itself, so
    ``active_users == cohort_size`` at offset 0 by construction),
    and ``retention_pct`` is rounded to 6 dp.

    ``period``: ``"week"`` (ISO Monday starts) or ``"day"``.
    ``"month"`` is supported too, with offsets in calendar months.
    """
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day/week/month, got {period!r}")
    ev = events.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("_u"),
        F.date_trunc(period, F.col(ts_col)).cast("date").alias("_p"),
    )
    # per-user first period: window-agg over the user hash partition;
    # the distinct + groupBy below reuse the same exchange
    w = Window.partitionBy("_u")
    grid = (
        ev.withColumn("_c", F.min("_p").over(w))
        .distinct()
        .withColumn(
            "_off",
            (
                F.months_between("_p", "_c").cast("long")
                if period == "month"
                else (
                    F.datediff("_p", "_c")
                    / F.lit(_PERIOD_DAYS[period])
                ).cast("long")
            ),
        )
    )
    cells = grid.groupBy(
        F.col("_c").alias("cohort"),
        F.col("_off").alias("period_offset"),
    ).agg(F.count(F.lit(1)).alias("active_users"))
    # cohort_size = the offset-0 cell (every user is active in their
    # own acquisition period by definition); cells is cohorts ×
    # offsets rows — broadcast the size lookup
    sizes = (
        cells.where(F.col("period_offset") == 0)
        .select("cohort", F.col("active_users").alias("cohort_size"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "period_offset",
            F.col("active_users").cast("long").alias("active_users"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.round(
                F.col("active_users") * 100.0 / F.col("cohort_size"),
                6,
            ).alias("retention_pct"),
        )
    )

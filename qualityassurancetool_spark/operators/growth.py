"""Growth accounting — new / retained / resurrected / churned users
per period.

The standard DAU/WAU/MAU decomposition (a16z "growth accounting"
convention): for each period P and user active in it,
 - NEW: first-ever active period;
 - RETAINED: also active in P-1;
 - RESURRECTED: previously active, but not in P-1.
CHURNED for period P counts users active in P-1 but not in P (they
carry no activity row in P, so they are accounted as a negative
quantity derived from the P-1 cohort).  net = new + resurrected -
churned is the period's active-user delta, an identity the tests
pin.

Spark shape: one shuffle on the user key; each user's distinct
active periods become a sorted array and a lag comparison classifies
every (user, period) in place (period arithmetic on ISO-week starts,
same engine-portable day-difference discipline as
``operators/cohort``).  Output is |periods| × 4 counters — driver
trivial.  Churn needs no extra pass: a user active in P-1 is churned
in P iff their NEXT active period is not P, which the same sorted
array answers with ``lead``.

Cross-engine: ``tools/extra_oracles.py::x_growth`` — DuckDB
lag/lead-window replica.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_PERIOD_DAYS = {"day": 1, "week": 7}


def growth_accounting(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """``(period_start, new_users, retained, resurrected, churned)``
    — one row per period that has activity or churn to report.
    """
    if period not in _PERIOD_DAYS:
        raise ValueError(f"period must be day/week, got {period!r}")
    plen = _PERIOD_DAYS[period]
    up = (
        events.where(F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("_u"),
            F.date_trunc(period, F.col(ts_col)).cast("date").alias("_p"),
        )
        .distinct()
    )
    w = Window.partitionBy("_u").orderBy("_p")
    seq = up.select(
        "_u",
        "_p",
        F.lag("_p").over(w).alias("_prev"),
        F.lead("_p").over(w).alias("_next"),
    )
    gap_prev = F.datediff("_p", "_prev") / plen
    status = (
        F.when(F.col("_prev").isNull(), F.lit("new"))
        .when(gap_prev == 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
    )
    active = seq.groupBy(F.col("_p").alias("period_start")).agg(
        F.sum(F.when(status == "new", 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.sum(F.when(status == "retained", 1).otherwise(0))
        .cast("long")
        .alias("retained"),
        F.sum(F.when(status == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("resurrected"),
    )
    # churned INTO period P+1: active in P, next active period != P+1
    gap_next = F.datediff("_next", "_p") / plen
    churn = (
        seq.where(F.col("_next").isNull() | (gap_next > 1))
        .select(F.date_add("_p", plen).alias("period_start"))
        .groupBy("period_start")
        .agg(F.count(F.lit(1)).cast("long").alias("churned"))
    )
    return (
        active.join(churn, "period_start", "full")
        .select(
            "period_start",
            *[
                F.coalesce(F.col(c), F.lit(0))
                .cast("long")
                .alias(c)
                for c in (
                    "new_users",
                    "retained",
                    "resurrected",
                    "churned",
                )
            ],
        )
    )

"""Ordered event-funnel analysis over per-user event streams.

First-touch funnel semantics (the convention of every production
funnel tool): a user's chain is anchored at their EARLIEST step-1
event; step k is matched by the earliest step-k event STRICTLY after
the matched step-(k-1) event (equal timestamps never satisfy two
consecutive steps); with a conversion window, every step after the
anchor must land within ``within`` of the anchor.  Greedy
earliest-match is deterministic and — absent the window — maximizes
depth, and it is exactly replicable as a chain of dependent
min-aggregations in ANSI SQL (the cross-engine oracle).

Scale shape: events are filtered to the step types FIRST (predicate
reaches the scan; a 3-step funnel over a 100 TB event log only ever
shuffles the 3 matching types), then ONE shuffle on the user key
builds the per-user time-sorted (ts, step) list and a JVM
higher-order-function fold walks the chain — no Python UDF, no
N-pass join per step.  Per-user state is bounded by that user's
step-type events inside the analysis range; for pathological single
users the N-pass dependent-min-join formulation (the oracle's shape)
is the fallback, at the price of one shuffle per step.

Reference scope: the reference tool has no funnel operator; this is
part of the large-scale analytics surface (events table) the Spark
engine adds.  Same gaps-and-islands event-stream family as
``operators/sessionize.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qualityassurancetool_spark.functions.timeutils import (
    epoch_micros,
    parse_timedelta_seconds,
)


def funnel_depth(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | float | None = None,
) -> DataFrame:
    """Per-user funnel depth under first-touch semantics.

    Returns one row per user having at least one step-1 event:
    ``(user_col, depth, anchor_us, last_us)`` where ``depth`` counts
    completed steps (1..len(steps)), ``anchor_us``/``last_us`` are
    the epoch-microsecond timestamps of the matched first and last
    step events.
    """
    if not steps:
        raise ValueError("steps must be a non-empty list of event types")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    win_us = (
        int(parse_timedelta_seconds(within) * 1_000_000)
        if within is not None
        else None
    )
    step_of = F.create_map(
        *[
            x
            for i, s in enumerate(steps)
            for x in (F.lit(s), F.lit(i + 1))
        ]
    )
    ev = (
        events.where(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col),
            epoch_micros(ts_col).alias("_us"),
            step_of[F.col(type_col)].alias("_step"),
        )
        .where(F.col("_us").isNotNull())
    )
    # One shuffle: per-user sorted (ts, step) list. Sorting by
    # (_us, _step) makes equal-timestamp handling deterministic:
    # at the same instant the LOWER step is visited first, so an
    # equal-ts pair can never advance two consecutive steps (the
    # strict `>` below already guarantees that; the sort pins which
    # single step it counts for).
    per_user = ev.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(F.struct("_us", "_step"))
        ).alias("_evts")
    )
    # Fold state: (depth, anchor_us, last_us). Advance on the next
    # needed step, strictly after the previous match, inside the
    # conversion window when one is set.
    zero = F.struct(
        F.lit(0).cast("int").alias("depth"),
        F.lit(None).cast("long").alias("anchor_us"),
        F.lit(None).cast("long").alias("last_us"),
    )
    n_steps = len(steps)

    def visit(acc, e):
        starts = (acc["depth"] == 0) & (e["_step"] == 1)
        in_window = (
            F.lit(True)
            if win_us is None
            else (e["_us"] - acc["anchor_us"] <= F.lit(win_us))
        )
        advances = (
            (acc["depth"] > 0)
            & (acc["depth"] < n_steps)
            & (e["_step"] == acc["depth"] + 1)
            & (e["_us"] > acc["last_us"])
            & in_window
        )
        return (
            F.when(
                starts,
                F.struct(
                    F.lit(1).cast("int").alias("depth"),
                    e["_us"].alias("anchor_us"),
                    e["_us"].alias("last_us"),
                ),
            )
            .when(
                advances,
                F.struct(
                    (acc["depth"] + 1).cast("int").alias("depth"),
                    acc["anchor_us"].alias("anchor_us"),
                    e["_us"].alias("last_us"),
                ),
            )
            .otherwise(acc)
        )

    out = per_user.select(
        F.col(user_col),
        F.aggregate(F.col("_evts"), zero, visit).alias("_f"),
    ).select(
        user_col,
        F.col("_f.depth").alias("depth"),
        F.col("_f.anchor_us").alias("anchor_us"),
        F.col("_f.last_us").alias("last_us"),
    )
    return out.where(F.col("depth") > 0)


def funnel_report(
    depth_df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
) -> DataFrame:
    """Aggregate per-user depths into the step table:
    ``(step, step_name, users, pct_of_first)`` where ``users`` counts
    users whose depth reached at least ``step``.  Steps no user
    reached still appear with ``users = 0``.
    """
    spark = depth_df.sparkSession
    names = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        schema="step int, step_name string",
    )
    reached = (
        depth_df.select(
            F.explode(F.sequence(F.lit(1), F.col("depth"))).alias(
                "step"
            )
        )
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("users"))
    )
    out = (
        names.join(F.broadcast(reached), "step", "left")
        .select(
            "step",
            "step_name",
            F.coalesce(F.col("users"), F.lit(0))
            .cast("long")
            .alias("users"),
        )
    )
    # pct relative to step 1; the report is len(steps) rows, so a
    # global window over it is driver-trivial by construction
    from pyspark.sql import Window

    w1 = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    step1 = F.max(
        F.when(F.col("step") == 1, F.col("users"))
    ).over(w1)
    return out.select(
        "step",
        "step_name",
        "users",
        F.when(
            step1 > 0,
            F.round(F.col("users") * 100.0 / step1, 6),
        ).alias("pct_of_first"),
    )

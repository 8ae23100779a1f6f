"""Streaming as-of join: the dependent-quantity propagation (J3) as a
stream-stream interval join.

Batch form (`operators/asof`) buckets by tolerance and picks the nearest
partner with a window.  The streaming form maps onto Structured
Streaming's native machinery instead:

- both sides are watermarked; stream-stream joins REQUIRE an equality
  predicate, so the batch operator's bucketing becomes the equi-key: the
  dependent side explodes to its 3 candidate tolerance-buckets, the
  independent side keeps ``floor(ts/tol)``, and the interval condition
  (``ind.ts BETWEEN dep.ts - tol AND dep.ts + tol``) rides along so each
  side's join buffer is trimmed once the other side's watermark passes;
- "nearest partner" cannot be a window function in a stream, so it is a
  second stateful operator: group by the dependent row and take
  ``min(struct(|Δt|, ind_ts, ind_id, ...))`` — Spark 4 supports chained
  stateful operators in append mode, emitting each dependent exactly once
  when the watermark closes its interval.

State is bounded by (watermark + tolerance) × arrival rate per side —
the streaming twin of the batch design's "candidates limited to 2
buckets" argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.timeutils import (
    ensure_timestamp,
    parse_timedelta_seconds,
)


def stream_asof_nearest(
    dep_stream: DataFrame,
    ind_stream: DataFrame,
    tolerance: str | float,
    watermark: str = "1 minute",
    dep_ts: str = "phenomenon_time",
    ind_ts: str = "phenomenon_time",
    dep_id: str = "iot_id",
    ind_id: str = "iot_id",
    ind_payload: list[str] | None = None,
) -> DataFrame:
    """Nearest-within-tolerance as-of across two streams.

    Returns one row per *matched* dependent observation (inner interval
    join; unmatched dependents are a quality signal the batch overlap
    re-run picks up — streaming left-outer + nearest-agg would need the
    outer row to carry through the second stateful op, which append mode
    only emits after watermark expiry anyway).

    Output: dep_id, dep_ts, nearest ind payload columns (prefixed
    ``ind_``) and ``abs_dt_s``.  Ties break on (|Δt|, ind_ts, ind_id) —
    identical to the batch operator.
    """
    tol_s = parse_timedelta_seconds(tolerance)
    payload = ind_payload or []

    tol_us = int(tol_s * 1_000_000)
    if tol_us <= 0:
        # floor(x / 0) is NULL under non-ANSI SQL: every bucket would
        # be NULL and the join would silently emit nothing (review
        # finding, round 8)
        raise ValueError(
            f"tolerance must be >= 1 microsecond, got {tolerance!r}"
        )
    d = (
        ensure_timestamp(dep_stream, dep_ts)
        .select(
            F.col(dep_id).alias("_dep_id"),
            F.col(dep_ts).alias("_dep_ts"),
        )
        .withWatermark("_dep_ts", watermark)
        .withColumn("_b0", F.floor(F.unix_micros("_dep_ts") / tol_us))
        .withColumn(
            "_bucket",
            F.explode(F.array(F.col("_b0") - 1, F.col("_b0"), F.col("_b0") + 1)),
        )
        .drop("_b0")
    )
    i = (
        ensure_timestamp(ind_stream, ind_ts)
        .select(
            F.col(ind_id).alias("_ind_id"),
            F.col(ind_ts).alias("_ind_ts"),
            *[F.col(c).alias(f"ind_{c}") for c in payload],
        )
        .withWatermark("_ind_ts", watermark)
        .withColumn("_ind_bucket", F.floor(F.unix_micros("_ind_ts") / tol_us))
    )

    joined = d.join(
        i,
        (F.col("_bucket") == F.col("_ind_bucket"))
        & F.expr(
            f"_ind_ts BETWEEN _dep_ts - INTERVAL {tol_s} SECONDS "
            f"AND _dep_ts + INTERVAL {tol_s} SECONDS"
        ),
        "inner",
    )
    abs_dt = F.abs(
        F.unix_micros("_dep_ts") - F.unix_micros("_ind_ts")
    ) / F.lit(1_000_000.0)
    candidate = F.struct(
        abs_dt.alias("abs_dt_s"),
        F.col("_ind_ts").alias("ind_ts"),
        F.col("_ind_id").alias("ind_id"),
        *[F.col(f"ind_{c}").alias(f"ind_{c}") for c in payload],
    )
    best = (
        joined.groupBy(
            F.col("_dep_id").alias("dep_id"),
            F.window("_dep_ts", f"{max(tol_s, 1.0)} seconds").alias("_w"),
        )
        # dep ids are unique, so every row in a group shares _dep_ts;
        # it rides as an aggregate because a second raw event-time column
        # in the grouping keys is rejected ("more than one event time")
        .agg(
            F.first("_dep_ts").alias("dep_ts"),
            F.min(candidate).alias("m"),
        )
    )
    return best.select(
        "dep_id",
        "dep_ts",
        F.col("m.ind_id").alias("ind_id"),
        F.col("m.ind_ts").alias("ind_ts"),
        F.col("m.abs_dt_s").alias("abs_dt_s"),
        *[F.col(f"m.ind_{c}").alias(f"ind_{c}") for c in payload],
    )

"""Long→wide export path (reference §3.2 / W-P1 / A2:
``wrapper_pivot_df`` + best-record-per-timestamp,
``src/aums_data_request.py:91-162``; golden shape ``tests/test_other.py:117-136``).

Steps: round timestamps to 1 s (nearest) and keep the distance-to-round;
per (rounded second, stream) keep the best record — sorted by flag quality
then time distance (A2) — then pivot streams into ``{stream}_result`` /
``{stream}_flag`` columns.  The pandas version pivots a MultiIndex; here the
wide schema is flat, the pivot values are pre-deduplicated (so no duplicate
explosion) and the whole thing is two shuffles (window + pivot agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import flag_rank
from qualityassurancetool_spark.functions.timeutils import (
    epoch_micros,
    round_to_seconds,
)


def with_rounded_time(
    df: DataFrame,
    ts_col: str = "phenomenon_time",
    round_col: str = "ts_round",
    dt_col: str = "dt_to_round_s",
    half_even: bool = False,
) -> DataFrame:
    """F4: round to nearest second + |Δt| to the rounded instant (reference
    ``time_conversions``, ``src/aums_data_request.py:91-94``)."""
    rounded = round_to_seconds(ts_col, half_even=half_even)
    dt = F.abs(epoch_micros(ts_col) - epoch_micros(rounded)) / 1_000_000.0
    return df.withColumn(round_col, rounded).withColumn(dt_col, dt)


def best_record_per_second(
    df: DataFrame,
    stream_col: str = "datastream_id",
    ts_col: str = "phenomenon_time",
    flag_col: str = "qc_flag",
    id_col: str = "iot_id",
    half_even: bool = False,
) -> DataFrame:
    """A2: per (rounded second, stream) keep the record with the best flag,
    then smallest distance-to-round, then smallest id (deterministic).

    Physical shape: ``min(struct(rank, dt, id, row))`` hash aggregation
    rather than a ``row_number`` window — partial aggregation ships one
    candidate per (second, stream, map task) and nothing sorts (same
    rewrite as the as-of nearest pick; identical outputs because (dt, id)
    make the order total and the null flag-rank coalesces to a losing
    sentinel, replicating ASC NULLS LAST)."""
    df = with_rounded_time(df, ts_col, half_even=half_even)
    cand = F.struct(
        F.coalesce(flag_rank(flag_col).cast("int"), F.lit(1 << 30)).alias("_o0"),
        F.col("dt_to_round_s").alias("_o1"),
        F.col(id_col).alias("_o2"),
        F.struct(*df.columns).alias("row"),
    )
    best = df.groupBy("ts_round", stream_col).agg(F.min(cand).alias("_m"))
    return best.select("_m.row.*")


def pivot_wide(
    df: DataFrame,
    stream_values: list,
    stream_col: str = "datastream_id",
    value_col: str = "result",
    flag_col: str = "qc_flag",
) -> DataFrame:
    """W-P1: one row per rounded second, ``{stream}_result``/``{stream}_flag``
    columns.  ``stream_values`` must be supplied (explicit pivot values keep
    the plan single-pass and the schema deterministic — at 100 TB you never
    want the implicit distinct-scan)."""
    deduped = best_record_per_second(df, stream_col=stream_col, flag_col=flag_col)
    pivoted = (
        deduped.groupBy("ts_round")
        .pivot(stream_col, stream_values)
        .agg(
            F.first(value_col).alias("result"),
            F.first(flag_col).alias("flag"),
        )
    )
    return pivoted.orderBy("ts_round")


def aggregate_pivot_export(
    df: DataFrame,
    stream_values: list,
    stream_col: str = "datastream_id",
    ts_col: str = "phenomenon_time",
    value_col: str = "result",
    flag_col: str = "qc_flag",
    id_col: str = "iot_id",
    lat_col: str = "lat",
    lon_col: str = "long",
    half_even: bool = True,
) -> DataFrame:
    """The reference's full aggregated export (``get_agg_data_from_pivoted``,
    ``src/aums_data_request.py:118-162``; golden ``tests/resources/df_agg.csv``
    at rtol=0.01, ``tests/test_other.py:141-170``): one row per rounded
    second carrying

    - the second's coordinates — the (lat, long) of the observation closest
      to the rounded instant across ALL streams (reference: sort by
      ``(ts_round, dt)`` → first), and
    - per stream, the best observation's ``{id}_result`` / ``{id}_flag`` —
      best = smallest (flag, Δt-to-round) (reference: ``fillna(9)`` on the
      flag then ``sort_values([ts_round, flag, dt]) → groupby.first()``;
      the flag sort key is the ordered-categorical severity order, which
      :func:`flags.flag_rank` reproduces).

    ``half_even=True`` mirrors pandas' ``.round("1s")`` tie rule so replayed
    golden rows align (57 exact-half-second rows in the shipped fixture).

    Scale shape: two hash aggregations on ``ts_round`` (coordinates and the
    explicit-values pivot) joined on the rounded second — no windows, no
    sorts except the final presentation ``orderBy``; map-side partial aggs
    ship one candidate per (second, stream, task).
    """
    df = with_rounded_time(df, ts_col, half_even=half_even)
    # coordinates: nearest-to-round observation per second over all streams
    coord_cand = F.struct(
        F.col("dt_to_round_s").alias("_o0"),
        F.col(id_col).alias("_o1"),
        F.col(lat_col).alias("lat_v"),
        F.col(lon_col).alias("lon_v"),
    )
    coords = df.groupBy("ts_round").agg(F.min(coord_cand).alias("_c"))
    coords = coords.select(
        "ts_round",
        F.col("_c.lat_v").alias(lat_col),
        F.col("_c.lon_v").alias(lon_col),
    )
    # per (second, stream) best record: (flag rank, Δt, id) min-struct;
    # null flags rank as MISSING (reference fillna(9)) not as a losing
    # sentinel — get_agg_data_from_pivoted fills BEFORE sorting
    best_cand = F.struct(
        F.coalesce(
            flag_rank(flag_col).cast("int"),
            flag_rank(F.lit(9)).cast("int"),
        ).alias("_o0"),
        F.col("dt_to_round_s").alias("_o1"),
        F.col(id_col).alias("_o2"),
        F.col(value_col).alias("val"),
        F.col(flag_col).alias("flg"),
    )
    best = (
        df.where(F.col(value_col).isNotNull())
        .groupBy("ts_round", stream_col)
        .agg(F.min(best_cand).alias("_b"))
    )
    pivoted = (
        best.groupBy("ts_round")
        .pivot(stream_col, stream_values)
        .agg(
            F.first("_b.val").alias("result"),
            F.first("_b.flg").alias("flag"),
        )
    )
    wide = coords.join(pivoted, "ts_round", "left")
    return wide.orderBy("ts_round")

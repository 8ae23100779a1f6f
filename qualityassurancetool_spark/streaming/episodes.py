"""Streaming alert episodes — the incident-collapse twin of
``operators/episodes.flag_episodes`` with bounded per-stream state.

The batch operator is a gaps-and-islands window over flagged rows; its
streaming form needs only the OPEN episode per stream — state is one
(start, end, n_rows, peak) tuple plus two counters, O(1) per stream
forever, regardless of history length.

Emission contract (update mode — sinks upsert by ``(stream,
episode)``):

- Every micro-batch that extends a *qualified* episode (``n_rows ≥
  min_rows``) re-emits its row with ``open = true`` — the sink always
  shows live incidents.
- When a later flagged row arrives more than ``max_gap`` after the
  episode's end, the episode closes: its final row emits with ``open =
  false`` and a new episode opens.  Closing is driven by FLAGGED rows
  only, exactly like the batch operator — an intervening healthy row
  never closes an episode, and a stream that simply goes quiet keeps
  its last episode open (emit-on-quiet would need a wall clock the
  batch semantics don't have).
- Episodes that never reach ``min_rows`` are never emitted (the batch
  debounce), and episode ids number QUALIFIED episodes 1..N per stream
  in start order — dense, matching the batch operator's post-debounce
  renumbering on every closed episode.

Parity with the batch operator (pinned by
``tests/test_streaming_episodes.py``, incl. checkpoint restart): on
in-order arrivals, the streaming CLOSED episodes plus the final open
row per stream equal ``flag_episodes`` over the same prefix
row-for-row (timestamps compared at epoch-µs exactness).

Scale: the flag predicate filters BEFORE the state exchange, so the
shuffle is anomaly-rate-sized, and state is O(streams) — the same
"filter first, windowed set is small" shape as the batch plan.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qualityassurancetool_spark.functions.timeutils import (
    parse_timedelta_seconds,
)
from qualityassurancetool_spark.streaming.control import _order_micros

EPISODE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), True),
        T.StructField("episode", T.LongType(), True),
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("peak_value", T.DoubleType(), True),
        T.StructField("open", T.BooleanType(), True),
    ]
)

# (qualified-episode counter, current id or 0 pre-debounce,
#  start_us, end_us, n_rows, peak (NaN = no value seen), has_open)
EPISODE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("emitted", T.LongType(), True),
        T.StructField("cur_id", T.LongType(), True),
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("has_open", T.BooleanType(), True),
    ]
)


def streaming_episodes(
    stream: DataFrame,
    flag: Column | str,
    ts_col: str,
    group_col: str,
    max_gap: str | float = "1h",
    value_col: str | None = None,
    min_rows: int = 1,
) -> DataFrame:
    """Collapse a live flag stream into incident rows.

    ``flag``: boolean column (name or expression); NULL counts as
    not-flagged.  Rows with NULL timestamps are ignored (cannot be
    placed), both matching the batch operator.
    """
    gap_s = parse_timedelta_seconds(max_gap)
    if gap_s <= 0:
        raise ValueError(f"max_gap must be > 0, got {max_gap!r}")
    if min_rows < 1:
        raise ValueError(f"min_rows must be >= 1, got {min_rows}")
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    gap_us = int(round(float(gap_s) * 1_000_000))
    need = int(min_rows)

    def row_of(key, eid, s, e, n, peak, is_open):
        return {
            "stream": key,
            "episode": eid,
            "start_us": s,
            "end_us": e,
            "n_rows": n,
            "duration_s": (e - s) / 1e6,
            "peak_value": None if math.isnan(peak) else peak,
            "open": is_open,
        }

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        emitted, cur_id, s_us, e_us, n, peak, has_open = (
            state.get
            if state.exists
            else (0, 0, 0, 0, 0, math.nan, False)
        )
        out: list[dict] = []
        touched = False
        # one sort over the whole per-key batch (Arrow chunks carry no
        # relative order — the streaming_cusum discipline)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values("t", kind="mergesort")
            for t, v in zip(pdf["t"], pdf["value"]):
                t = int(t)
                if has_open and t - e_us > gap_us:
                    if cur_id:
                        out.append(
                            row_of(
                                key[0], cur_id, s_us, e_us, n, peak,
                                False,
                            )
                        )
                    has_open = False
                    touched = False
                if not has_open:
                    has_open = True
                    cur_id, s_us, e_us, n, peak = 0, t, t, 0, math.nan
                e_us = max(e_us, t)
                n += 1
                touched = True
                if v is not None and not (
                    isinstance(v, float) and math.isnan(v)
                ):
                    fv = float(v)
                    peak = fv if math.isnan(peak) else max(peak, fv)
                if cur_id == 0 and n >= need:
                    emitted += 1
                    cur_id = emitted
        if touched and cur_id:
            out.append(
                row_of(key[0], cur_id, s_us, e_us, n, peak, True)
            )
        if out:
            yield pd.DataFrame(out)
        state.update(
            (emitted, cur_id, s_us, e_us, n, peak, has_open)
        )

    fl = F.col(flag) if isinstance(flag, str) else flag
    keyed = stream.where(
        fl.isNotNull() & fl & F.col(ts_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("stream"),
        _order_micros(stream, ts_col).alias("t"),
        (
            F.col(value_col).cast("double")
            if value_col
            else F.lit(None).cast("double")
        ).alias("value"),
    )
    return keyed.groupBy("stream").applyInPandasWithState(
        update,
        outputStructType=EPISODE_OUTPUT_SCHEMA,
        stateStructType=EPISODE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

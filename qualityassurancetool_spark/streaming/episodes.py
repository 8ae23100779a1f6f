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


class EpisodeFold:
    """The per-stream episode state machine, factored out so
    :func:`streaming_episodes` and the fused chart→episodes operator
    (``streaming/incident_chain``) run the IDENTICAL fold — Spark
    forbids chaining two ``applyInPandasWithState`` stages in one
    query, so composition happens inside one state update instead."""

    __slots__ = (
        "key", "gap_us", "need", "emitted", "cur_id", "s_us", "e_us",
        "n", "peak", "has_open", "touched", "out",
    )

    def __init__(self, key: str, state_tuple, gap_us: int, need: int):
        (
            self.emitted, self.cur_id, self.s_us, self.e_us, self.n,
            self.peak, self.has_open,
        ) = state_tuple
        self.key = key
        self.gap_us = gap_us
        self.need = need
        self.touched = False
        self.out: list[dict] = []

    def _row(self, is_open: bool) -> dict:
        return {
            "stream": self.key,
            "episode": self.cur_id,
            "start_us": self.s_us,
            "end_us": self.e_us,
            "n_rows": self.n,
            "duration_s": (self.e_us - self.s_us) / 1e6,
            "peak_value": None if math.isnan(self.peak) else self.peak,
            "open": is_open,
        }

    def push(self, t: int, v) -> None:
        """One FLAGGED row at epoch-µs ``t`` with optional value."""
        t = int(t)
        if self.has_open and t - self.e_us > self.gap_us:
            if self.cur_id:
                self.out.append(self._row(False))
            self.has_open = False
            self.touched = False
        if not self.has_open:
            self.has_open = True
            self.cur_id, self.s_us, self.e_us = 0, t, t
            self.n, self.peak = 0, math.nan
        self.e_us = max(self.e_us, t)
        self.n += 1
        self.touched = True
        if v is not None and not (isinstance(v, float) and math.isnan(v)):
            fv = float(v)
            self.peak = fv if math.isnan(self.peak) else max(self.peak, fv)
        if self.cur_id == 0 and self.n >= self.need:
            self.emitted += 1
            self.cur_id = self.emitted

    def finish(self) -> list[dict]:
        """Rows to emit for this micro-batch (closed + live open)."""
        if self.touched and self.cur_id:
            self.out.append(self._row(True))
        return self.out

    @property
    def state(self):
        return (
            self.emitted, self.cur_id, self.s_us, self.e_us, self.n,
            self.peak, self.has_open,
        )


EPISODE_EMPTY_STATE = (0, 0, 0, 0, 0, math.nan, False)


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

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        fold = EpisodeFold(
            key[0],
            state.get if state.exists else EPISODE_EMPTY_STATE,
            gap_us,
            need,
        )
        # one sort over the whole per-key batch (Arrow chunks carry no
        # relative order — the streaming_cusum discipline)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values("t", kind="mergesort")
            for t, v in zip(pdf["t"], pdf["value"]):
                fold.push(t, v)
        out = fold.finish()
        if out:
            yield pd.DataFrame(out)
        state.update(fold.state)

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

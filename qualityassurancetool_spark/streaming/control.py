"""Streaming control charts — EWMA and CUSUM twins with bounded
per-stream state.

The batch charts (``operators/ewma``, ``operators/cusum``) are window
expressions over a whole history; their streaming twins carry exactly
the chart's sufficient state across micro-batches instead:

- **CUSUM**: Page's recurrence needs only the two one-sided statistics
  — state is 2 doubles per stream, forever (the recurrence itself is
  the state; this is the rare sequential operator whose streaming form
  is TRIVIALLY bounded).
- **EWMA**: the bounded-lag form needs the last ``window`` values —
  state is K doubles per stream (NaN marks NULL holes so lag
  positions match the batch operator's row-counting semantics).

Parity contract: on rows that arrive in chart order per stream
ACROSS micro-batches (the source's append order; WITHIN a batch the
whole per-key batch is sorted by ``order_col`` once — Arrow chunk
boundaries carry no order guarantee, so the chunks are concatenated
before the sort), every emitted row equals the batch operator's row
for the same prefix — pinned by ``tests/test_streaming_control.py``
including across a checkpoint restart.  Out-of-order arrivals are the
caller's problem (sort upstream or accept chart-order = arrival
order); the charts are sequential by definition.

CUSUM's in-control ``target``/``sigma`` must be EXPLICIT here — the
batch default estimates them from the batch, which a stream cannot do
without peeking at its own future.

Scale: state is per-stream O(1); each micro-batch shuffles by the
stream key once (the applyInPandasWithState exchange).  Both queries
run ``applyInPandasWithState`` in **update** output mode (the only
mode Spark allows for this operator alongside append); semantically
every input row yields its charted row exactly once — sinks must
treat rows as upserts keyed by (stream, t), the way the test
foreachBatch sink does.  NULL inputs re-emit as SQL NULL (nullable
Float64 Arrow arrays), matching the batch operators' NULL discipline.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _order_micros(stream: DataFrame, order_col: str):
    """Order column -> exact integer key: timestamps become epoch
    MICROseconds (a bare cast("long") truncates to whole seconds and
    sub-second rows would tie, feeding the recurrence in arbitrary
    order); integral columns pass through."""
    for f in stream.schema.fields:
        if f.name == order_col and isinstance(
            f.dataType, (T.TimestampType, T.TimestampNTZType)
        ):
            return F.unix_micros(F.col(order_col).cast("timestamp"))
    return F.col(order_col).cast("long")


CUSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), True),
        T.StructField("t", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("cusum_pos", T.DoubleType(), True),
        T.StructField("cusum_neg", T.DoubleType(), True),
        T.StructField("cusum_flag", T.BooleanType(), True),
    ]
)

CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sp", T.DoubleType(), True),
        T.StructField("sn", T.DoubleType(), True),
        # batch parity: the chart is NULL until the first non-null
        # value has ever been seen (the batch window sum over an
        # all-NULL prefix is NULL, not 0)
        T.StructField("started", T.BooleanType(), True),
    ]
)


def streaming_cusum(
    stream: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str,
    target: float,
    sigma: float,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Per-row CUSUM chart rows; state = 2 doubles per stream."""
    if sigma <= 0:
        raise ValueError(f"sigma must be > 0, got {sigma}")
    if slack < 0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    mu, sd, k, h = float(target), float(sigma), float(slack), float(
        threshold
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        sp, sn, started = (
            state.get if state.exists else (0.0, 0.0, False)
        )
        # ONE sort over the whole per-key micro-batch: the pdfs
        # iterator yields Arrow CHUNKS (~10k rows each) whose relative
        # order is not the chart order — sorting chunks independently
        # would feed the recurrence out of order for large groups
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values("t", kind="mergesort")
            out_sp, out_sn, out_fl = [], [], []
            for v in pdf["value"]:
                if v is None or (
                    isinstance(v, float) and math.isnan(v)
                ):
                    out_sp.append(sp if started else None)
                    out_sn.append(sn if started else None)
                    out_fl.append(None)
                    continue
                started = True
                z = (float(v) - mu) / sd
                sp = max(0.0, sp + z - k)
                sn = max(0.0, sn - z - k)
                out_sp.append(sp)
                out_sn.append(sn)
                out_fl.append(bool(sp > h or sn > h))
            yield pd.DataFrame(
                {
                    "stream": key[0],
                    "t": pdf["t"].values,
                    "value": pd.array(
                        [None if pd.isna(v) else float(v)
                         for v in pdf["value"]],
                        dtype="Float64",
                    ),
                    "cusum_pos": pd.array(out_sp, dtype="Float64"),
                    "cusum_neg": pd.array(out_sn, dtype="Float64"),
                    "cusum_flag": pd.array(out_fl, dtype="boolean"),
                }
            )
        state.update((sp, sn, started))

    keyed = stream.select(
        F.col(group_col).cast("string").alias("stream"),
        _order_micros(stream, order_col).alias("t"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("stream").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), True),
        T.StructField("t", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("ewma", T.DoubleType(), True),
        T.StructField("ewma_prev", T.DoubleType(), True),
        T.StructField("ewma_sigma", T.DoubleType(), True),
        T.StructField("ewma_dev", T.DoubleType(), True),
        T.StructField("ewma_flag", T.BooleanType(), True),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [T.StructField("lags", T.ArrayType(T.DoubleType()), True)]
)


class EwmaStep:
    """The per-stream EWMA recurrence, factored out so
    :func:`streaming_ewma` and the fused chart→episodes operator
    (``streaming/incident_chain``) run the IDENTICAL per-row step —
    the same sharing discipline as ``streaming/episodes.EpisodeFold``.

    ``lags`` holds the last ``window`` raw values, most recent FIRST,
    NaN = NULL hole (lag positions count rows exactly like the batch
    operator)."""

    __slots__ = (
        "lags", "alpha", "window", "nsigma", "min_history", "rel_eps",
    )

    def __init__(self, lags, alpha, window, nsigma, min_history, rel_eps):
        self.lags: list[float] = list(lags)
        self.alpha = alpha
        self.window = window
        self.nsigma = nsigma
        self.min_history = min_history
        self.rel_eps = rel_eps

    def _wmean(self, vals) -> float | None:
        """α(1−α)^k-weighted mean over vals (index 0 = most recent),
        NaN entries skipped with renormalization — `_weighted_lags`
        semantics."""
        num = den = 0.0
        for i, v in enumerate(vals):
            if v is None or math.isnan(v):
                continue
            w = self.alpha * (1.0 - self.alpha) ** i
            num += w * v
            den += w
        return num / den if den > 0 else None

    def push(self, v):
        """One raw value (None/NaN = hole) → (ewma, prev, sigma, dev,
        flag); advances the lag window."""
        window = self.window
        x = (
            None
            if v is None or (isinstance(v, float) and math.isnan(v))
            else float(v)
        )
        lags = self.lags
        hist = [
            u for u in lags[:window] if u is not None and not math.isnan(u)
        ]
        prev = self._wmean(lags[:window])
        nhist = len(hist)
        if nhist >= 2:
            m = sum(hist) / nhist
            var = sum((u - m) ** 2 for u in hist) / (nhist - 1)
            sg = math.sqrt(var)
        else:
            sg = None
        cur = self._wmean(
            [x if x is not None else math.nan] + lags[: window - 1]
        )
        dev = x - prev if x is not None and prev is not None else None
        if (
            x is not None
            and prev is not None
            and sg is not None
            and nhist >= self.min_history
        ):
            eps = self.rel_eps * max(abs(x), abs(prev))
            fl = bool(abs(dev) > self.nsigma * sg + eps)
        else:
            fl = None
        self.lags = [x if x is not None else math.nan] + lags[: window - 1]
        return cur, prev, sg, dev, fl


def streaming_ewma(
    stream: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str,
    alpha: float = 0.3,
    window: int = 16,
    nsigma: float = 3.0,
    min_history: int = 4,
    rel_eps: float = 1e-9,
) -> DataFrame:
    """Per-row EWMA chart rows; state = the last ``window`` values per
    stream (NaN = NULL hole, so lag positions count rows exactly like
    the batch operator)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_history < 2:
        raise ValueError(f"min_history must be >= 2, got {min_history}")
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        step = EwmaStep(
            list(state.get[0]) if state.exists else [],
            alpha, window, nsigma, min_history, rel_eps,
        )
        # whole-batch sort (see streaming_cusum: Arrow chunks are not
        # in chart order)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values("t", kind="mergesort")
            cols: dict[str, list] = {
                c: []
                for c in ("ewma", "prev", "sigma", "dev", "flag")
            }
            for v in pdf["value"]:
                cur, prev, sg, dev, fl = step.push(v)
                cols["ewma"].append(cur)
                cols["prev"].append(prev)
                cols["sigma"].append(sg)
                cols["dev"].append(dev)
                cols["flag"].append(fl)
            yield pd.DataFrame(
                {
                    "stream": key[0],
                    "t": pdf["t"].values,
                    "value": pd.array(
                        [None if pd.isna(v) else float(v)
                         for v in pdf["value"]],
                        dtype="Float64",
                    ),
                    "ewma": pd.array(cols["ewma"], dtype="Float64"),
                    "ewma_prev": pd.array(cols["prev"], dtype="Float64"),
                    "ewma_sigma": pd.array(cols["sigma"], dtype="Float64"),
                    "ewma_dev": pd.array(cols["dev"], dtype="Float64"),
                    "ewma_flag": pd.array(
                        cols["flag"], dtype="boolean"
                    ),
                }
            )
        state.update((step.lags,))

    keyed = stream.select(
        F.col(group_col).cast("string").alias("stream"),
        _order_micros(stream, order_col).alias("t"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("stream").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

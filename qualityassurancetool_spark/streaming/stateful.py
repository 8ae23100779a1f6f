"""Custom stateful streaming operator: per-stream cumulative flag stats.

The reference keeps cross-window state only by re-fetching a look-back
window each cron run (``src/main.py:224-239``).  The idiomatic Structured
Streaming upgrade holds that state in the engine instead:
``applyInPandasWithState`` keyed by stream, carrying (rows seen, bad rows,
latest timestamp) across micro-batches — the state survives restarts via
the checkpoint, so a re-run continues instead of re-reading history.

Used for monitoring surfaces (per-stream data-quality ratios over the
whole history) that the batch engine would need an ever-growing scan for.
At scale, state is per-stream (small); the state store shuffles by key
exactly once per batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("observation_type", T.StringType(), True),
        T.StructField("n_total", T.LongType(), True),
        T.StructField("n_bad", T.LongType(), True),
        T.StructField("last_t_us", T.LongType(), True),
    ]
)

STATS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_total", T.LongType(), True),
        T.StructField("n_bad", T.LongType(), True),
        T.StructField("last_t_us", T.LongType(), True),
    ]
)


def _update_stats(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_total, n_bad, last_t = state.get
    else:
        n_total, n_bad, last_t = 0, 0, 0
    for pdf in pdfs:
        n_total += len(pdf)
        n_bad += int((pdf["qc_flag"] == 4).sum())
        if len(pdf):
            last_t = max(last_t, int(pdf["t_us"].max()))
    state.update((n_total, n_bad, last_t))
    yield pd.DataFrame(
        {
            "observation_type": [key[0]],
            "n_total": [n_total],
            "n_bad": [n_bad],
            "last_t_us": [last_t],
        }
    )


def running_flag_stats(flagged_stream: DataFrame) -> DataFrame:
    """Cumulative (rows, bad rows, latest ts) per stream, updated each
    micro-batch.  Input needs columns: observation_type, qc_flag, t_us."""
    return (
        flagged_stream.select("observation_type", "qc_flag", "t_us")
        .groupBy("observation_type")
        .applyInPandasWithState(
            _update_stats,
            outputStructType=STATS_OUTPUT_SCHEMA,
            stateStructType=STATS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    stream: DataFrame,
    id_cols: list[str],
    ts_col: str = "phenomenon_time",
    within: str = "50 minutes",
) -> DataFrame:
    """Streaming exactly-once dedup: drop re-deliveries of the same ids
    arriving within the watermark (the reference's overlap re-covers data
    every run — ``crontab/env_qc_settings:2`` — so the landed stream
    contains duplicates by design; this bounds the dedup state instead of
    keeping all history)."""
    from qualityassurancetool_spark.functions.timeutils import ensure_timestamp

    stream = ensure_timestamp(stream, ts_col)
    return stream.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
        id_cols
    )

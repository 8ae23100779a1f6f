"""Fused chart → episodes → incident-upsert chain: the always-on QC
monitoring loop as ONE checkpointed streaming query (VERDICT r8 item 6;
the reference's cron QC loop, ``crontab/crontab:4``, is exactly this
chain batchwise).

Spark forbids two ``applyInPandasWithState`` stages in one streaming
query (``Multiple applyInPandasWithStates are not supported``), so the
composition is a FUSED stateful operator: per stream, ONE state row
carries both the CUSUM recurrence (2 doubles + a started bit) and the
open-episode tuple (``streaming/episodes.EpisodeFold`` — the identical
fold the standalone operator runs).  That is also the better plan at
scale: one keyed exchange and one state store instead of two, with the
anomaly filtering happening inside the fold (chart rows never cross a
second shuffle).

Emission contract = :func:`..episodes.streaming_episodes`'s: update
mode, upsert key ``(stream, episode)``, live incidents re-emitted with
``open = true`` every extending batch, closes emitted once with
``open = false``.  :func:`start_incident_upsert` is the matching
last-writer-wins parquet sink (the ``sources/sinks.upsert_flags_table``
discipline applied to the incident key); a batch replay after a crash
rewrites the same rows, so the chain is restart-idempotent end to end —
pinned by the kill/restart-mid-open-incident test in
``tests/test_incident_chain.py``.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qualityassurancetool_spark.functions.timeutils import (
    parse_timedelta_seconds,
)
from qualityassurancetool_spark.streaming.control import _order_micros
from qualityassurancetool_spark.streaming.episodes import (
    EPISODE_EMPTY_STATE,
    EPISODE_OUTPUT_SCHEMA,
    EPISODE_STATE_SCHEMA,
    EpisodeFold,
)

# CUSUM recurrence (2 doubles + started) ++ episode tuple
CHAIN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sp", T.DoubleType(), True),
        T.StructField("sn", T.DoubleType(), True),
        T.StructField("started", T.BooleanType(), True),
        T.StructField("emitted", T.LongType(), True),
        T.StructField("cur_id", T.LongType(), True),
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("has_open", T.BooleanType(), True),
    ]
)


def streaming_cusum_episodes(
    stream: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str,
    target: float,
    sigma: float,
    slack: float = 0.5,
    threshold: float = 5.0,
    max_gap: str | float = "1h",
    min_rows: int = 1,
) -> DataFrame:
    """CUSUM chart + incident collapse in one stateful pass.

    Per row (per stream, in ``order_col`` order): the CUSUM recurrence
    updates; rows whose ``cusum_pos`` or ``cusum_neg`` exceed
    ``threshold`` feed the episode fold with value
    ``max(cusum_pos, cusum_neg)`` (the excursion magnitude — so
    ``peak_value`` reads as "how far past the limit the incident ran").
    Output rows and upsert semantics are exactly
    :func:`..episodes.streaming_episodes`'s.

    Batch parity (pinned in ``tests/test_incident_chain.py``): equals
    ``operators/cusum`` → ``operators/episodes.flag_episodes`` with
    ``value = greatest(cusum_pos, cusum_neg)`` over the same prefix.
    """
    if sigma <= 0:
        raise ValueError(f"sigma must be > 0, got {sigma}")
    if slack < 0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    gap_s = parse_timedelta_seconds(max_gap)
    if gap_s <= 0:
        raise ValueError(f"max_gap must be > 0, got {max_gap!r}")
    if min_rows < 1:
        raise ValueError(f"min_rows must be >= 1, got {min_rows}")
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    mu, sd = float(target), float(sigma)
    k, h = float(slack), float(threshold)
    gap_us = int(round(float(gap_s) * 1_000_000))
    need = int(min_rows)

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            sp, sn, started = st[0], st[1], st[2]
            ep_state = st[3:]
        else:
            sp, sn, started = 0.0, 0.0, False
            ep_state = EPISODE_EMPTY_STATE
        fold = EpisodeFold(key[0], ep_state, gap_us, need)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            # ONE sort over the whole per-key batch (Arrow chunks carry
            # no relative order — the streaming_cusum discipline)
            pdf = pdf.sort_values("t", kind="mergesort")
            for t, v in zip(pdf["t"], pdf["value"]):
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    continue  # chart semantics: NULL values carry state
                started = True
                z = (float(v) - mu) / sd
                sp = max(0.0, sp + z - k)
                sn = max(0.0, sn - z - k)
                if sp > h or sn > h:
                    fold.push(int(t), max(sp, sn))
        out = fold.finish()
        if out:
            yield pd.DataFrame(out)
        state.update((sp, sn, started) + fold.state)

    keyed = stream.select(
        F.col(group_col).cast("string").alias("stream"),
        _order_micros(stream, order_col).alias("t"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("stream").applyInPandasWithState(
        update,
        outputStructType=EPISODE_OUTPUT_SCHEMA,
        stateStructType=CHAIN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# EWMA lag window ++ episode tuple
EWMA_CHAIN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("lags", T.ArrayType(T.DoubleType()), True),
        T.StructField("emitted", T.LongType(), True),
        T.StructField("cur_id", T.LongType(), True),
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("has_open", T.BooleanType(), True),
    ]
)


def streaming_ewma_episodes(
    stream: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str,
    alpha: float = 0.3,
    window: int = 16,
    nsigma: float = 3.0,
    min_history: int = 4,
    rel_eps: float = 1e-9,
    max_gap: str | float = "1h",
    min_rows: int = 1,
) -> DataFrame:
    """EWMA chart + incident collapse in one stateful pass — the
    :func:`streaming_cusum_episodes` shape with the EWMA recurrence
    (``streaming/control.EwmaStep``, the identical per-row step the
    standalone chart runs).  Flagged rows feed the episode fold with
    value ``abs(ewma_dev)`` (how far the point sat from its forecast).

    Batch parity (pinned in ``tests/test_incident_chain.py``): equals
    ``operators/ewma.ewma_anomaly`` → ``flag_episodes`` with
    ``value = abs(ewma_dev)`` over the same prefix."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_history < 2:
        raise ValueError(f"min_history must be >= 2, got {min_history}")
    gap_s = parse_timedelta_seconds(max_gap)
    if gap_s <= 0:
        raise ValueError(f"max_gap must be > 0, got {max_gap!r}")
    if min_rows < 1:
        raise ValueError(f"min_rows must be >= 1, got {min_rows}")
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from qualityassurancetool_spark.streaming.control import EwmaStep

    gap_us = int(round(float(gap_s) * 1_000_000))
    need = int(min_rows)

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            lags = list(st[0])
            ep_state = st[1:]
        else:
            lags = []
            ep_state = EPISODE_EMPTY_STATE
        step = EwmaStep(lags, alpha, window, nsigma, min_history, rel_eps)
        fold = EpisodeFold(key[0], ep_state, gap_us, need)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values("t", kind="mergesort")
            for t, v in zip(pdf["t"], pdf["value"]):
                _cur, _prev, _sg, dev, fl = step.push(v)
                if fl:
                    fold.push(int(t), abs(dev))
        out = fold.finish()
        if out:
            yield pd.DataFrame(out)
        state.update((step.lags,) + fold.state)

    keyed = stream.select(
        F.col(group_col).cast("string").alias("stream"),
        _order_micros(stream, order_col).alias("t"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("stream").applyInPandasWithState(
        update,
        outputStructType=EPISODE_OUTPUT_SCHEMA,
        stateStructType=EWMA_CHAIN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_seasonal_episodes(
    stream: DataFrame,
    baseline: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str,
    period: str = "hour_of_day",
    nsigma: float = 3.0,
    min_samples: int = 5,
    rel_eps: float = 1e-9,
    max_gap: str | float = "1h",
    min_rows: int = 1,
) -> DataFrame:
    """Seasonal-profile chart + incident collapse in one stateful pass —
    the production diurnal-cycle monitor (VERDICT r9 item 3; the
    reference's cron QC loop applied to learned seasonal baselines).

    ``baseline`` is a :func:`..operators.seasonal.seasonal_profile`
    frame FIT ON HISTORY (grouped by exactly ``[group_col]``): at most
    groups × 168 sufficient-statistic rows — driver-scale metadata,
    collected once and shipped into the operator closure like the ANN
    centroids, NOT per-stream state.  The chart itself is therefore
    stateless (score = where the point sits vs its phase cell); only
    the episode tuple lives in the state store, so state stays O(streams)
    like the other chains.

    The phase cell is computed with the SAME Spark expression the batch
    operator uses (``operators/seasonal._cell``, session-timezone
    semantics included) BEFORE the stateful exchange — the Python fold
    never re-derives calendar fields from epoch micros, so batch parity
    is arithmetic-exact.  Scoring replicates ``seasonal_zscore``'s
    column math verbatim: ``mu = s1/n``, sample variance floored at 0,
    scale-relative epsilon, ``n >= min_samples`` gate.  Flagged rows
    feed the episode fold with ``abs(seasonal_dev)``.

    Batch parity (pinned in ``tests/test_incident_chain.py``): equals
    ``seasonal_zscore(batch, baseline=profile)`` →
    ``flag_episodes(seasonal_flag, value = abs(seasonal_dev))`` over
    the same prefix."""
    if nsigma <= 0:
        raise ValueError(f"nsigma must be > 0, got {nsigma}")
    if min_samples < 2:
        raise ValueError(f"min_samples must be >= 2, got {min_samples}")
    gap_s = parse_timedelta_seconds(max_gap)
    if gap_s <= 0:
        raise ValueError(f"max_gap must be > 0, got {max_gap!r}")
    if min_rows < 1:
        raise ValueError(f"min_rows must be >= 1, got {min_rows}")
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from qualityassurancetool_spark.operators.seasonal import (
        _cell,
        check_profile_period,
    )

    # a stored profile scored under a different period hits WRONG cells
    # silently (hour_of_day ⊂ hour_of_week key space) — validate the
    # round-10 period stamp when the frame carries one
    check_profile_period(baseline, period)
    missing = {group_col, "cell", "n", "sum_x", "sum_x2"} - set(
        baseline.columns
    )
    if missing:
        raise ValueError(
            f"baseline must be a seasonal_profile frame grouped by "
            f"[{group_col!r}]; missing columns {sorted(missing)}"
        )
    # a profile grouped by EXTRA columns (e.g. [g1, g2]) would pass the
    # missing-columns check and then the dict comprehension keyed on
    # (group_col, cell) silently overwrites duplicate keys — wrong
    # z-scores with no error.  Refuse unexpected columns loudly, like
    # the period stamp does.
    extra = set(baseline.columns) - {
        group_col,
        "cell",
        "n",
        "sum_x",
        "sum_x2",
        "period",
    }
    if extra:
        raise ValueError(
            f"baseline carries unexpected columns {sorted(extra)}: a "
            f"profile grouped by more than [{group_col!r}] would "
            f"collapse ambiguously onto ({group_col!r}, cell) keys — "
            f"re-fit seasonal_profile grouped by [{group_col!r}] only"
        )
    # bounded collect: groups × <=168 cells of (n, sum_x, sum_x2)
    prof = {
        (
            None if r[group_col] is None else str(r[group_col]),
            int(r["cell"]),
        ): (int(r["n"]), float(r["sum_x"]), float(r["sum_x2"]))
        for r in baseline.collect()
    }
    gap_us = int(round(float(gap_s) * 1_000_000))
    need = int(min_rows)
    ns, eps_rel, min_n = float(nsigma), float(rel_eps), int(min_samples)

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ep_state = state.get if state.exists else EPISODE_EMPTY_STATE
        fold = EpisodeFold(key[0], ep_state, gap_us, need)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values("t", kind="mergesort")
            for t, v, cell in zip(pdf["t"], pdf["value"], pdf["cell"]):
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    continue
                if cell is None or (
                    isinstance(cell, float) and math.isnan(cell)
                ):
                    continue
                st = prof.get((key[0], int(cell)))
                if st is None:
                    continue
                n, s1, s2 = st
                if n < min_n or n < 2:
                    continue
                x = float(v)
                mu = s1 / n
                var = max((s2 - s1 * s1 / n) / (n - 1), 0.0)
                sigma = math.sqrt(var)
                dev = x - mu
                eps = eps_rel * max(abs(x), abs(mu))
                if abs(dev) > ns * sigma + eps:
                    fold.push(int(t), abs(dev))
        out = fold.finish()
        if out:
            yield pd.DataFrame(out)
        state.update(fold.state)

    keyed = stream.select(
        F.col(group_col).cast("string").alias("stream"),
        _order_micros(stream, order_col).alias("t"),
        F.col(value_col).cast("double").alias("value"),
        _cell(order_col, period).alias("cell"),
    )
    return keyed.groupBy("stream").applyInPandasWithState(
        update,
        outputStructType=EPISODE_OUTPUT_SCHEMA,
        stateStructType=EPISODE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_incident_upsert(
    incidents: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Last-writer-wins incident sink: each micro-batch's episode rows
    merge into a parquet table keyed ``(stream, episode)`` — the flags
    upsert discipline (``sources/sinks.upsert_flags_table``) applied to
    the incident key.  An ``open = true`` row is superseded by the
    next batch's re-emission (or its close); replaying a batch after a
    crash rewrites the same keys, so the sink converges.

    The merge stages to a ``<path>_stage`` sibling dir to break the
    read-from-overwritten-path lineage (an incident table is small —
    open incidents + closed history — so a full rewrite per batch is
    the honest cost of parquet's missing MERGE; a transactional table
    format upgrades this in place).  Returns the started
    ``StreamingQuery``."""
    from qualityassurancetool_spark.functions.fs import (
        delete_path,
        path_exists,
    )

    def _upsert(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = batch_df
        if path_exists(spark, path):
            existing = spark.read.parquet(path)
            keep = existing.join(
                out.select("stream", "episode"),
                ["stream", "episode"],
                "left_anti",
            )
            out = keep.unionByName(out)
        stage = path.rstrip("/") + "_stage"
        out.write.mode("overwrite").parquet(stage)
        spark.read.parquet(stage).write.mode("overwrite").parquet(path)
        delete_path(spark, stage)

    writer = (
        incidents.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Micro-batch orchestration with overlapping windows (reference §2.8:
cron fires 10-minute windows with 50-minute look-back overlap —
``crontab/env_qc_settings:1-2`` — and the backfill driver sweeps fixed
overlapping windows, ``qc_historical/qc_historical.sh:73-100``).

Two surfaces:

1. ``windowed_batch_runner`` — exact parity with the reference: a driver
   loop over ``[start − overlap, end)`` slices; each slice is one batch QC
   run whose output overwrites that window's flag partitions (idempotent
   re-run, last-writer-wins re-flagging).  The *stabilization look-back*
   (fetch extra history before the window so time-since-exceedance is
   correct at the window edge — reference ``src/main.py:224-239``) is the
   ``lookback`` parameter: rows in the look-back are used for state but not
   emitted.

2. ``streaming_qc`` — the idiomatic Structured Streaming upgrade:
   ``readStream`` → the same stateless column checks → watermarked sink.
   The overlap knob becomes ``withWatermark`` lateness.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.timeutils import (
    ensure_timestamp,
    parse_timedelta_seconds,
)


def iter_windows(
    start: dt.datetime,
    end: dt.datetime,
    width: str | float,
    overlap: str | float = 0.0,
) -> Iterator[tuple[dt.datetime, dt.datetime]]:
    """Fixed overlapping windows: each step advances by ``width`` but each
    window re-covers ``overlap`` of its predecessor (the reference's
    START_II = START_I − OVERLAP arithmetic)."""
    w = dt.timedelta(seconds=parse_timedelta_seconds(width))
    o = dt.timedelta(seconds=parse_timedelta_seconds(overlap))
    if w <= dt.timedelta(0):
        # cur would never advance: the driver loop spins forever
        raise ValueError(f"window width must be positive, got {width!r}")
    if o < dt.timedelta(0):
        raise ValueError(f"overlap must be >= 0, got {overlap!r}")
    cur = start
    while cur < end:
        lo = max(start, cur - o)
        hi = min(cur + w, end)
        yield (lo, hi)
        cur = cur + w


def windowed_batch_runner(
    spark: SparkSession,
    load_window: Callable[[dt.datetime, dt.datetime], DataFrame],
    qc_fn: Callable[[DataFrame], DataFrame],
    sink_fn: Callable[[DataFrame, dt.datetime, dt.datetime], None],
    start: dt.datetime,
    end: dt.datetime,
    width: str | float = "10min",
    overlap: str | float = "50min",
    lookback: str | float = 0.0,
    ts_col: str = "phenomenon_time",
) -> int:
    """Run QC over overlapping windows; returns number of windows run.

    ``lookback`` widens each read for stateful checks (stabilization) but
    results are trimmed back to the window before sinking — exact parity
    with the reference's widened fetch."""
    lb = dt.timedelta(seconds=parse_timedelta_seconds(lookback))
    n = 0
    for lo, hi in iter_windows(start, end, width, overlap):
        df = load_window(lo - lb, hi)
        flagged = qc_fn(df)
        trimmed = flagged.where(
            (F.col(ts_col) >= F.lit(lo)) & (F.col(ts_col) < F.lit(hi))
        )
        sink_fn(trimmed, lo, hi)
        n += 1
    return n


def streaming_qc(
    stream: DataFrame,
    qc_fn: Callable[[DataFrame], DataFrame],
    watermark: str = "50 minutes",
    ts_col: str = "phenomenon_time",
) -> DataFrame:
    """Structured Streaming variant: same column-level checks, late data
    bounded by the watermark (the overlap analog).  Caller attaches the
    sink (``writeStream.foreachBatch(upsert)`` for re-flag semantics)."""
    stream = ensure_timestamp(stream, ts_col)
    return qc_fn(stream.withWatermark(ts_col, watermark))


def start_flags_upsert(
    flagged_stream: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "phenomenon_time",
    available_now: bool = True,
):
    """§2.8 idempotent re-flag sink: ``writeStream.foreachBatch`` where
    each micro-batch dynamic-partition-overwrites only the flag-table days
    it touches — the streaming analog of the reference re-PATCHing every
    overlapped window (last-writer-wins re-flagging,
    ``src/main.py:366-395``).  Exactly-once per partition comes from the
    overwrite being deterministic, not from sink transactions: replaying a
    batch rewrites the same rows.

    Returns the started ``StreamingQuery``; caller awaits termination.
    """
    from qualityassurancetool_spark.sources.sinks import upsert_flags_table

    def _upsert(batch_df: DataFrame, _batch_id: int) -> None:
        # ROW-level merge, not per-day overwrite: successive micro-
        # batches routinely share a day, and a day-partition overwrite
        # by batch N deleted batch N-1's flags for that day (review
        # finding, round 8); replay of the SAME batch still converges
        upsert_flags_table(batch_df, path, ts_col=ts_col)

    writer = (
        flagged_stream.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_session_stats(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization: ``session_window`` keeps per-entity open
    sessions as state, closes one when the watermark passes its end + gap.
    State is bounded by (active entities x open sessions); the batch twin
    is ``operators.sessionize`` (same gap semantics: a gap strictly
    greater than ``gap`` splits).

    Boundary parity: Spark's ``session_window`` SPLITS at a gap exactly
    equal to ``gap`` (merge condition is diff < gap) while the batch
    twin splits only on strictly-greater — so the window is widened by
    one microsecond (merge when diff < gap + 1 µs ⇔ diff <= gap at
    Spark's µs timestamp resolution), making the twins agree on the
    boundary row (review finding, round 8)."""
    from qualityassurancetool_spark.functions.timeutils import (
        timedelta_micros,
    )

    stream = ensure_timestamp(stream, ts_col)
    gap_plus = f"{timedelta_micros(gap) + 1} microseconds"
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(entity_col),
            F.session_window(F.col(ts_col), gap_plus).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            entity_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def tumbling_flag_rollup(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "50 minutes",
    ts_col: str = "phenomenon_time",
    flag_col: str = "qc_flag",
) -> DataFrame:
    """Windowed flag histogram as a streaming aggregate — the streaming
    analog of the reference's per-run flag counts."""
    stream = ensure_timestamp(stream, ts_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(flag_col).alias("flag"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w.start", "w.end", "flag", "n")
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
    digest_col: str = "content_hash",
) -> DataFrame:
    """Streaming exact dedup: first-seen document per normalized-text
    digest survives; later copies inside the watermark horizon drop.

    ``dropDuplicatesWithinWatermark`` keys STATE on the 16-byte digest,
    never the text — state size is bounded by distinct-docs-per-horizon,
    and eviction follows the event-time watermark (the unbounded-state
    hazard of plain ``dropDuplicates`` on a stream).  Batch parity: the
    digest is exactly ``operators/dedup.exact_dedup``'s grouping key, so
    a backfill and the stream agree on what is a duplicate (which copy
    survives differs — streams keep the first ARRIVED, batch keeps the
    min id; both are one-representative-per-digest)."""
    from qualityassurancetool_spark.functions.hashing import normalize_text
    from qualityassurancetool_spark.functions.timeutils import ensure_timestamp

    stream = ensure_timestamp(stream, ts_col)
    withd = stream.withColumn(
        digest_col, F.md5(normalize_text(F.col(text_col)))
    )
    return withd.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [digest_col]
    )


def streaming_curate(
    stream: DataFrame,
    cfg,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    classifier_model: tuple[list[float], float] | None = None,
    available_now: bool = True,
):
    """Streaming corpus curation: apply the config-driven decision sheet
    (``plans.curation.curate``) to each micro-batch via ``foreachBatch``
    and append decisions to a parquet sink.

    ``curate``'s exact-dedup rule needs a window over the content
    digest, which Structured Streaming cannot run statelessly — so the
    ``duplicate`` rule collapses copies WITHIN a micro-batch only.
    Cross-batch exact dedup composes upstream:
    ``streaming_exact_dedup(stream) |> streaming_curate(...)`` gives
    watermark-bounded global dedup plus per-batch rules, the standard
    split between bounded-state and stateless stages.  Decisions land
    one OVERWRITTEN ``batch=N`` dir per micro-batch — a foreachBatch
    replay (same batch id, same input slice) replaces its own rows
    instead of double-appending (review finding, round 8: a bare
    append doubled batch N's decision rows on replay); a root read of
    ``out_path`` sees all batches plus a ``batch`` partition column.

    Returns the started ``StreamingQuery``.
    """
    import posixpath

    from qualityassurancetool_spark.plans.curation import curate

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        decisions = curate(
            batch_df, cfg, text_col=text_col, id_col=id_col,
            classifier_model=classifier_model,
        )
        decisions.write.mode("overwrite").parquet(
            posixpath.join(out_path, f"batch={batch_id}")
        )

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_near_dedup_admission(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 8,
    threshold: float = 0.5,
    available_now: bool = True,
):
    """Cross-batch NEAR-dup admission control on a stream: each
    micro-batch is screened against the persisted winnowing fingerprint
    index (``operators/fingerprint.near_dedup_against_corpus``), its
    decisions append to ``out_path``, and the fingerprints of ADMITTED
    documents extend the index — so a document resubmitted with a small
    edit in a LATER batch is caught, which watermark-keyed exact dedup
    cannot do.

    Retry idempotence: BOTH the index and the decisions grow as one
    parquet subdirectory per batch id (``batch=N``), written with
    overwrite — a re-run of batch N replaces its own contribution
    instead of appending twice, and the screen excludes batch N's OWN
    index slice (a crash replay after the index write must never screen
    the batch against its own fingerprints: every resubmitted doc would
    read as a duplicate of itself and the replay would overwrite the
    slice EMPTY — review finding, round 8; same contract as
    ``pretrain_stream``, via the shared ``read_fingerprint_index``).
    Within a batch, earlier documents do not screen later ones
    (batch-atomic semantics); run the batch operator on the output for
    intra-batch pairs.

    Returns the started StreamingQuery.
    """
    import posixpath

    from qualityassurancetool_spark.operators.fingerprint import (
        document_fingerprints,
        near_dedup_against_corpus,
        read_fingerprint_index,
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            seen_fp = read_fingerprint_index(
                spark, index_path, "batch=",
                exclude=f"batch={batch_id}", id_col=id_col,
                id_type=batch_df.schema[id_col].dataType.simpleString(),
            )
            decisions = near_dedup_against_corpus(
                batch_df, seen_fp, text_col, id_col,
                k=k, w=w, threshold=threshold,
            )
            dec_path = posixpath.join(out_path, f"batch={batch_id}")
            decisions.write.mode("overwrite").parquet(dec_path)
            # read back THIS batch's dir only — the previous
            # whole-table read grew O(stream history) per batch
            admitted = batch_df.join(
                spark.read.parquet(dec_path)
                .where("kept")
                .select(id_col),
                id_col,
                "left_semi",
            )
            document_fingerprints(
                admitted, text_col, id_col, k=k, w=w
            ).write.mode("overwrite").parquet(
                posixpath.join(index_path, f"batch={batch_id}")
            )
        finally:
            batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

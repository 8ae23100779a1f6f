"""Sinks (reference S9–S12): flag write-back, JSON patch files, CSV export.

The reference PATCHes flags back over HTTP in ``$batch`` requests
(``src/main.py:854-859``) with a dry-run switch (``:317``).  Here the same
contract is: build patch bodies as JSON rows (testable, deterministic), then
either (a) write them as a parquet/text *flags table* — the idempotent
re-runnable path, partition-overwrite per time window — or (b) stream them
through ``foreachPartition`` with an injectable sender (executors each post
their partition's batches; nothing funnels through the driver).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def build_patch_bodies(
    df: DataFrame,
    id_col: str = "iot_id",
    flag_col: str = "qc_flag",
    url_entity: str = "Observations",
) -> DataFrame:
    """One JSON PATCH body per observation (reference
    ``create_patch_json``, ``src/main.py:822-841``)."""
    return df.select(
        F.col(id_col).alias("entity_id"),
        F.to_json(
            F.struct(F.col(flag_col).cast("int").alias("resultQuality"))
        ).alias("body"),
        F.concat(
            F.lit(f"{url_entity}("), F.col(id_col).cast("string"), F.lit(")")
        ).alias("url_path"),
    )


def build_feature_patch_bodies(
    df: DataFrame,
    feature_id_col: str = "feature_id",
    feature_flag_col: str = "feature_qc_flag",
    url_entity: str = "FeaturesOfInterest",
) -> DataFrame:
    """One PATCH body per *FeatureOfInterest* (reference feature-flag
    patch: ``patch_qc_flags(columns=[Df.FEATURE_ID, Df.FEATURE_QC_FLAG],
    url_entity=Entities.FEATURESOFINTEREST, json_body_template=
    FEATURES_BODY_TEMPLATE)``, ``src/main.py:638-652``).

    Observations sharing a feature may carry different flag values after
    overlapping windows, so the builder aggregates severity-max per
    feature first — one deterministic body per feature id, not one per
    observation row.  SensorThings has no ``resultQuality`` on a feature,
    so the flag travels in the entity's ``properties`` (the public STA
    extension point)."""
    from qualityassurancetool_spark.flags import flag_rank, rank_to_flag

    per_feature = (
        df.where(F.col(feature_id_col).isNotNull())
        .where(F.col(feature_flag_col).isNotNull())
        .groupBy(F.col(feature_id_col).alias("entity_id"))
        .agg(rank_to_flag(F.max(flag_rank(feature_flag_col))).alias("_flag"))
    )
    return per_feature.select(
        "entity_id",
        F.to_json(
            F.struct(
                F.struct(
                    F.col("_flag").cast("int").alias("qc_flag")
                ).alias("properties")
            )
        ).alias("body"),
        F.concat(
            F.lit(f"{url_entity}("),
            F.col("entity_id").cast("string"),
            F.lit(")"),
        ).alias("url_path"),
    )


def write_patch_files(df: DataFrame, path: str) -> None:
    """S11: serialize would-be PATCH bodies to files (debug/audit dump)."""
    build_patch_bodies(df).select(
        F.to_json(F.struct("entity_id", "url_path", "body")).alias("line")
    ).write.mode("overwrite").text(path)


def write_flags_table(
    df: DataFrame,
    path: str,
    id_col: str = "iot_id",
    flag_col: str = "qc_flag",
    ts_col: str | None = "phenomenon_time",
) -> None:
    """Whole-day flags write: a parquet table partitioned by date whose
    touched DAY partitions are replaced wholesale (dynamic partition
    overwrite).  Correct ONLY when ``df`` carries a day's complete flag
    set — a window/micro-batch covering part of a day would DELETE the
    day's other rows; those callers use :func:`upsert_flags_table`
    (review finding, round 8)."""
    out = df.select(
        F.col(id_col),
        F.col(flag_col),
        *([F.to_date(F.col(ts_col)).alias("flag_date")] if ts_col else []),
    )
    writer = out.write.mode("overwrite")
    if ts_col:
        writer = writer.partitionBy("flag_date").option(
            "partitionOverwriteMode", "dynamic"
        )
    writer.parquet(path)


def upsert_flags_table(
    df: DataFrame,
    path: str,
    id_col: str = "iot_id",
    flag_col: str = "qc_flag",
    ts_col: str = "phenomenon_time",
    sweep_moved_ids: bool = False,
) -> None:
    """ROW-level last-writer-wins upsert into the date-partitioned flags
    table — the reference PATCHes flags per observation
    (``src/main.py:366-395``), and the windowed runner's default 10-min
    windows put many windows in one day, so the per-day overwrite of
    :func:`write_flags_table` would delete a day's earlier windows'
    rows on every run (review finding, round 8).

    Mechanics: the batch's rows are merged with the surviving rows of
    the touched day partitions (anti-join on ``id_col``), staged to a
    ``_upsert_stage`` dir inside the table (underscore-prefixed =
    invisible to readers) to break the read-from-overwritten-path
    lineage, then dynamic-overwritten back.  Re-running the same window
    converges (its rows replace the same ids).  The final partition
    rewrite is the non-atomic step — parquet has no multi-partition
    commit; a crash inside it needs the window re-run (the driver
    loop's natural retry).  A transactional table format is the 100 TB
    upgrade path for that boundary.

    Date-move contract (review finding, round 8): the default fast
    path anti-joins only the batch's own day partitions, assuming an
    observation id maps to exactly one date — true for the reference,
    whose ``phenomenon_time`` is immutable per observation.  If a
    source CAN re-date an observation (a corrected timestamp crossing
    midnight), pass ``sweep_moved_ids=True``: one extra full-table id
    semi-join widens the rewrite set to any old partition still
    holding a batch id, so the stale row under the old date is
    dropped.  The sweep's scan is table-sized, so it is opt-in.
    Dynamic overwrite only rewrites partitions the staged frame WRITES
    — a swept day whose every row belonged to batch ids stages zero
    survivors, so its partition would never be touched and the stale
    rows would survive (advisor finding, round 9); such now-empty day
    partitions are deleted explicitly after the write."""
    from qualityassurancetool_spark.functions.fs import (
        delete_path,
        path_exists,
    )

    spark = df.sparkSession
    out = df.select(
        F.col(id_col),
        F.col(flag_col),
        F.to_date(F.col(ts_col)).alias("flag_date"),
    )
    stage = None
    if path_exists(spark, path):
        days = [r[0] for r in out.select("flag_date").distinct().collect()]
        if not days:
            return
        if sweep_moved_ids:
            moved_days = [
                r[0]
                for r in spark.read.parquet(path)
                .join(
                    F.broadcast(out.select(id_col).distinct()),
                    id_col,
                    "left_semi",
                )
                .where(~F.col("flag_date").isin(days))
                .select("flag_date")
                .distinct()
                .collect()
            ]
            days = days + moved_days
        existing = spark.read.parquet(path).where(
            F.col("flag_date").isin(days)
        )
        keep = existing.join(out.select(id_col), id_col, "left_anti")
        stage = path.rstrip("/") + "/_upsert_stage"
        keep.unionByName(out).write.mode("overwrite").parquet(stage)
        out = spark.read.parquet(stage)
    (
        out.write.mode("overwrite")
        .partitionBy("flag_date")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    if stage is not None:
        # days the rewrite set covered but the staged frame left empty
        # (every row was a batch id that moved away) — dynamic overwrite
        # never touched them, so drop the stale partitions directly
        staged_days = {
            r[0] for r in out.select("flag_date").distinct().collect()
        }
        for day in days:
            if day not in staged_days:
                delete_path(spark, f"{path.rstrip('/')}/flag_date={day}")
        delete_path(spark, stage)


def make_http_batch_sender(
    base_url: str,
    auth: tuple[str, str] | None = None,
    timeout: float = 30.0,
    retries: int = 4,
    backoff: float = 0.5,
) -> Callable[[list[Row]], None]:
    """Live sender for :func:`http_patch_sink`: POSTs each batch as ONE
    SensorThings ``$batch`` request (JSON batching, the reference's
    ``$batch`` endpoint — ``src/main.py:318,854-859``) with
    retry/backoff.  Runs executor-side: the returned closure only
    captures plain strings/numbers, so it pickles cleanly into
    ``foreachPartition``.

    Raises :class:`~..sources.http_client.HttpError` (which fails the
    task → Spark task retry → idempotent re-PATCH, safe because flag
    writes are last-writer-wins) if a batch cannot be delivered."""
    batch_url = base_url.rstrip("/") + "/$batch"

    def sender(rows: list[Row]) -> None:
        from .http_client import request_json

        body = {
            "requests": [
                {
                    "id": str(i),
                    "method": "patch",
                    "url": r["url_path"],
                    "body": json.loads(r["body"]),
                }
                for i, r in enumerate(rows)
            ]
        }
        request_json(
            batch_url,
            method="POST",
            body=body,
            auth=auth,
            timeout=timeout,
            retries=retries,
            backoff=backoff,
        )

    return sender


def http_patch_sink(
    df: DataFrame,
    sender: Callable[[list[Row]], None] | None = None,
    batch_size: int = 100,
    dry_run: bool = True,
) -> int:
    """S10: executor-side batched PATCH via ``foreachPartition``.

    ``sender`` receives one list of Rows per batch; the default dry-run
    sender counts bodies without any I/O (reference dry-run switch).
    Returns the number of patch bodies produced.
    """
    bodies = build_patch_bodies(df)
    n = bodies.count()
    if dry_run and sender is None:
        return n

    def handle(partition: Iterator[Row]) -> None:
        batch: list[Row] = []
        for row in partition:
            batch.append(row)
            if len(batch) >= batch_size:
                sender(batch)  # type: ignore[misc]
                batch = []
        if batch:
            sender(batch)  # type: ignore[misc]

    bodies.foreachPartition(handle)
    return n


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S9 CSV sink; ``single_file`` coalesces (export-sized data only)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)

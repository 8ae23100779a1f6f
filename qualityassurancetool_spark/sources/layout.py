"""Landing-table layout: the physical design that makes every QC run a
pruned scan.

The reference fetches "one time window of one Thing" per run (S1/P1);
at 100 TB the equivalent is *not* a query engine trick but table layout:

- **partition by date** — a time-window run touches only its days'
  directories (partition pruning happens at planning, before any I/O);
- **sort within partitions by (stream, ts)** — parquet row-group min/max
  statistics prune inside a day for narrower windows, and per-stream
  window operators read nearly-sorted runs (cheaper sort, better
  compression on timestamps/ids);
- **one writer task per date** (repartition on the partition column) —
  no small-file explosion: file count scales with days × retries, not
  days × shuffle partitions.

Re-runs are idempotent: dynamic partition overwrite rewrites only the
days present in the incoming batch (same contract as
``sinks.write_flags_table``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_observations_landing(
    df: DataFrame,
    path: str,
    ts_col: str = "phenomenon_time",
    stream_col: str = "observation_type",
    date_col: str = "obs_date",
) -> None:
    """Write the observations table in the pruning-friendly layout."""
    (
        df.withColumn(date_col, F.to_date(F.col(ts_col)))
        .repartition(F.col(date_col))
        .sortWithinPartitions(stream_col, ts_col)
        .write.partitionBy(date_col)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )


def read_observations_window(
    spark: SparkSession,
    path: str,
    start,
    end,
    ts_col: str = "phenomenon_time",
    date_col: str = "obs_date",
    schema=None,
) -> DataFrame:
    """Read one QC window from the landing table.  The date predicate is
    derived from the timestamp window so partition pruning applies; the
    timestamp predicate then prunes row groups within the boundary days.

    Pass ``schema`` in production (from the catalog): footer-sampling
    schema inference is an extra read per planning and touches files the
    partition filter would never open."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    return df.where(
        (F.col(date_col) >= F.lit(start.date()))
        & (F.col(date_col) <= F.lit(end.date()))
        & (F.col(ts_col) >= F.lit(start))
        & (F.col(ts_col) < F.lit(end))
    ).drop(date_col)


def write_corpus_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    partition_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "shard:",
) -> None:
    """Training-corpus layout: partition directories by ``partition_col``
    (language/source — the axis curation and sampling filter on), a FIXED
    number of shard files per partition, and DETERMINISTIC shard
    membership (md5(salt‖id) — no ``rand()``), so task retries, re-runs,
    and incremental rebuilds place every doc in the same shard file.

    The shard is a PARTITION DIRECTORY (``lang=X/shard=K/``), not a file
    name: a shard's row set is a pure function of the data even when the
    shuffle maps two shard groups onto one task (directory membership
    survives task-level collisions; file names never carry meaning).
    File count is bounded by partitions × n_shards regardless of
    upstream parallelism — no small-file explosion at 100 TB — and shard
    sizes stay balanced because membership is a uniform hash.  Dynamic
    partition overwrite keeps re-runs idempotent per directory."""
    from qualityassurancetool_spark.operators.sampling import uniform_hash

    shard = F.floor(
        uniform_hash(F.col(id_col), salt) * F.lit(float(n_shards))
    ).cast("int")
    (
        df.withColumn("shard", shard)
        .repartition(F.col(partition_col), F.col("shard"))
        .sortWithinPartitions(id_col)
        .write.partitionBy(partition_col, "shard")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    x_range: tuple[float, float],
    y_col: str,
    y_range: tuple[float, float],
    n_files: int,
    bits: int = 16,
) -> None:
    """2-D-clustered parquet layout: range-partition + sort by the
    Morton key of (x_col, y_col) so every output file covers a compact
    rectangle of the 2-D space — per-file min/max column statistics
    become tight in BOTH dimensions, and rectangle predicates
    (lat BETWEEN … AND long BETWEEN …) skip most files at scan time.
    The key is computed from EXPLICIT ranges (stable across incremental
    writes) and dropped before writing — the layout leaves the schema
    untouched.  `tests/test_zorder.py` proves the pruning effect
    behaviorally: summed per-file bounding-box area shrinks ~10x vs an
    id-ordered layout of the same data."""
    from qualityassurancetool_spark.functions.zorder import zorder_key

    key = zorder_key(
        F.col(x_col), x_range, F.col(y_col), y_range, bits=bits
    )
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_dataset(
    spark,
    path: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
) -> dict:
    """Small-files maintenance: rewrite a parquet dataset into files of
    ~``target_file_mb`` — the janitorial pass every long-lived 100 TB
    landing zone needs (streaming sinks and per-batch appends strand
    thousands of KB-sized files; scan cost then is dominated by file
    open/footer overhead, not bytes).

    File count is sized from the dataset's CURRENT on-disk bytes
    (os.walk — the true post-compression size, which row-count
    heuristics get wrong by the compression ratio).  The rewrite goes
    through a staging directory + atomic directory swap so a failed
    compaction never destroys the input; re-runs are idempotent.

    Returns {files_before, files_after, bytes}.  Partitioned layouts
    re-partition per directory when ``partition_by`` is given (each
    partition compacts independently, preserving pruning).
    """
    import math
    import os
    import shutil

    def walk_stats(p):
        n, b = 0, 0
        for root, _, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    b += os.path.getsize(os.path.join(root, f))
        return n, b

    files_before, total_bytes = walk_stats(path)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb << 20)))
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + ".compact-staging"
    shutil.rmtree(staging, ignore_errors=True)
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    old = path.rstrip("/") + ".compact-old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(path, old)
    os.replace(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    files_after, _ = walk_stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }

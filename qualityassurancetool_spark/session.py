"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the conf is chosen so the same code path
scales to a multi-executor cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow on (pandas-UDF fast path), sensible
shuffle-partition default for the local scale (overridable by env).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "qualityassurancetool-spark") -> SparkSession:
    # Python workers are separate processes that must import this package
    # for pickled-by-reference kernels (mapInPandas/applyInPandas); make
    # sure the package root rides along even when the driver script runs
    # from another directory (cluster deployments ship a wheel instead).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_parts = os.environ.get("QAT_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # dirty-data tolerance: div-by-zero / overflow yield null instead of
        # failing a 1000-executor job on one duplicate timestamp
        .config("spark.sql.ansi.enabled", "false")
        # read INT64 TIMESTAMP(NANOS) parquet columns as long (Spark has no
        # ns timestamp); schema.load_table converts to µs TimestampType
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("QAT_DRIVER_MEM", "8g"))
        # UI off for throughput; SPARK_GRAFT_UI=1 re-enables it for the
        # probes that read shuffle/spill metrics from the UI REST API
        # (tools/dress_rehearsal.py)
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # call-site capture for DataFrame error context costs ~4 py4j
        # round-trips + a Python stack walk on EVERY DataFrame/Column API
        # call — about half the driver-side plan-build time of the larger
        # QC chains. This is an engine, not a notebook: trade the enriched
        # error call-sites for build throughput.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # static conf, read once at first-session creation: the generated-
        # class cache defaults to 100 entries; a full query-suite pass
        # produces several hundred codegen units, so structurally-shared
        # stages (same text-analysis or scan subplans across queries) get
        # LRU-evicted and Janino-recompiled. Classes are weakly referenced
        # — a bigger cache costs only metadata.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
    )
    # shuffle files live until the driver JVM GCs their
    # ShuffleDependency (ContextCleaner), and Spark's fallback periodic
    # GC fires every 30 MIN — a multi-pass disk-bound job (the
    # band-batched minhash at 100 M docs) accumulates every pass's
    # shuffle files and fills the disk long before that (round-10
    # rehearsal: 19 GB of dead shuffle files at ENOSPC).  QAT_PERIODIC_GC
    # (e.g. "2min") tightens the interval for such runs; unset keeps
    # Spark's default.
    gc_interval = os.environ.get("QAT_PERIODIC_GC")
    if gc_interval:
        builder = builder.config(
            "spark.cleaner.periodicGC.interval", gc_interval
        )
    return builder.getOrCreate()

"""Streaming pretraining-corpus capstone — the micro-batch twin of
``plans/pretrain.run_pretrain_pipeline``.

One checkpointed query runs the full admission chain per micro-batch:

 1. **exact dedup** across batches — ``streaming_exact_dedup``
    (watermark-bounded digest state) upstream of the sink;
 2. **curation** — the one-pass decision sheet per batch;
 3. **near-dup admission** — survivors screened against the persisted
    winnowing-fingerprint index of everything admitted so far, then the
    admitted docs' fingerprints extend the index;
 4. **corpus append** — admitted documents land under
    ``corpus/batch=N``.

Every per-batch artifact (decisions, admissions, corpus slice, index
slice) is written to its own ``batch=N`` directory with OVERWRITE — a
foreachBatch retry (same batch_id, same input slice, the Structured
Streaming recovery contract) replaces its own output instead of
double-appending, so the pipeline is idempotent under kill/restart at
any point.  The query runs with ``availableNow`` + ``maxFilesPerTrigger``
so a landing directory drains in bounded batches and a later run with
the same checkpoint resumes EXACTLY where the previous one stopped.

**Finalize** is a deterministic batch step over the admitted corpus —
chunk + pack + shard via the batch capstone itself (which also
re-screens intra-batch near-dup pairs that batch-atomic admission
cannot see).  Because every stage is md5-keyed, a streaming build that
admits the same document set as a batch build produces BYTE-IDENTICAL
shards (pinned by ``tests/test_streaming_pretrain.py``).

Scale shape: state is the digest watermark store plus the fingerprint
index (ints only, one parquet slice per batch); text never enters any
shuffle; each micro-batch does one broadcast screen against the index.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.fs import (
    list_subdirs,
    mkdirs,
)
from qualityassurancetool_spark.streaming.micro_batch import (
    streaming_exact_dedup,
)


def streaming_pretrain_ingest(
    stream: DataFrame,
    cfg,
    work_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ingest_ts",
    k: int = 20,
    w: int = 8,
    threshold: float = 0.5,
    watermark: str = "1 hour",
    classifier_model: tuple[list[float], float] | None = None,
    available_now: bool = True,
    exact_dedup: bool = True,
):
    """Start the checkpointed admission query (stages 1-4 above) over a
    document stream; returns the StreamingQuery.  Layout under
    ``work_dir``: ``decisions/ admissions/ corpus/ index/``, each one
    subdirectory per batch id."""
    from qualityassurancetool_spark.operators.fingerprint import (
        document_fingerprints,
        near_dedup_against_corpus,
    )
    from qualityassurancetool_spark.plans.curation import curate

    dirs = {
        n: posixpath.join(work_dir, n)
        for n in ("decisions", "admissions", "corpus", "index")
    }
    # Hadoop-FS mkdirs, NOT os.makedirs: a remote work_dir (hdfs://,
    # s3a://) would otherwise get a literal local "s3a:/..." dir while
    # Spark writes elsewhere (review finding, round 8)
    for d in dirs.values():
        mkdirs(stream.sparkSession, d)

    if exact_dedup:
        stream = streaming_exact_dedup(
            stream, text_col=text_col, ts_col=ts_col, watermark=watermark
        ).drop("content_hash")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.drop(ts_col).persist()
        try:
            # 2. curation decision sheet for this batch
            decisions = curate(
                batch_df, cfg, text_col=text_col, id_col=id_col,
                classifier_model=classifier_model,
            )
            decisions.write.mode("overwrite").parquet(
                posixpath.join(dirs["decisions"], f"batch={batch_id}")
            )
            kept = batch_df.join(
                spark.read.parquet(
                    posixpath.join(dirs["decisions"], f"batch={batch_id}")
                ).where("keep").select(id_col),
                id_col,
                "left_semi",
            )
            # 3. near-dup screen against everything admitted so far
            # (shared helper: prior slices minus this batch's own —
            # one implementation of the exclusion/empty-schema contract
            # for both the streaming and incremental capstones)
            from qualityassurancetool_spark.operators.fingerprint import (
                read_fingerprint_index,
            )

            seen_fp = read_fingerprint_index(
                spark, dirs["index"], "batch=",
                exclude=f"batch={batch_id}", id_col=id_col,
                id_type=kept.schema[id_col].dataType.simpleString(),
            )
            admissions = near_dedup_against_corpus(
                kept, seen_fp, text_col, id_col,
                k=k, w=w, threshold=threshold,
            )
            admissions.write.mode("overwrite").parquet(
                posixpath.join(dirs["admissions"], f"batch={batch_id}")
            )
            admitted = kept.join(
                spark.read.parquet(
                    posixpath.join(dirs["admissions"], f"batch={batch_id}")
                ).where("kept").select(id_col),
                id_col,
                "left_semi",
            )
            # 4. corpus slice + index extension, both batch-overwrite
            admitted.write.mode("overwrite").parquet(
                posixpath.join(dirs["corpus"], f"batch={batch_id}")
            )
            document_fingerprints(
                admitted, text_col, id_col, k=k, w=w
            ).write.mode("overwrite").parquet(
                posixpath.join(dirs["index"], f"batch={batch_id}")
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


def read_admitted_corpus(spark, work_dir: str) -> DataFrame:
    """The admitted document set across all completed batches."""
    corpus = posixpath.join(work_dir, "corpus")
    slices = [
        posixpath.join(corpus, d)
        for d in list_subdirs(spark, corpus, prefix="batch=")
    ]
    return spark.read.parquet(*slices)


def finalize_streaming_pretrain(
    spark, work_dir: str, cfg, out_dir: str
) -> dict:
    """Deterministic batch finalization: admitted corpus → batch
    capstone (re-screens intra-batch near-dup pairs, then chunk + pack
    + shard).  Same md5-keyed code path as a pure-batch build, so equal
    admitted sets ⇒ byte-identical shards."""
    from qualityassurancetool_spark.plans.pretrain import (
        run_pretrain_pipeline,
    )

    return run_pretrain_pipeline(
        read_admitted_corpus(spark, work_dir), cfg, out_dir
    )

"""Incremental corpus builds — reprocess ONLY what changed between
crawl snapshots.

The batch capstone (``plans/pretrain``) rebuilds from the full
snapshot; the streaming capstone (``streaming/pretrain_stream``) admits
an unbounded stream.  This plan covers the third operating mode of a
production corpus: a PERIODIC full snapshot (daily Common-Crawl-style
refresh) where 95 %+ of documents are byte-identical to yesterday.
Rescanning 100 TB to re-curate 2 TB of change is the cost bug;
``snapshot_diff``'s digest join finds the changed set, and only that
set flows through curation + near-dup admission.

State layout under ``state_dir`` (every write is an ``upd=N`` slice —
the same overwrite-idempotent batch-directory contract as the
streaming capstone):

- ``seen/upd=N/``    — (doc_id, content_hash) digests of snapshot N
                       (digests only: yesterday's text is never
                       needed again; the diff always reads the LAST
                       COMMITTED snapshot's digests, so a crashed
                       update re-diffs against consistent state);
- ``corpus/upd=N/``  — documents admitted in update N;
- ``touched/upd=N/`` — every doc_id processed OR removed in update N;
- ``index/upd=N/``   — winnowing fingerprints of update N's admissions.

Semantics:

- **current corpus** = for each doc, its admitted row from the LAST
  update that touched it (latest-wins: a revision that fails curation
  withdraws the previously admitted version; a removal tombstones it);
- **near-dup admission** screens against the APPEND-ONLY fingerprint
  history — "everything ever admitted", so content that re-appears
  under a trivial edit after its original was superseded is still
  recognized as a duplicate (the conservative crawl-dedup convention;
  documented trade: it can reject a near-dup of since-removed content);
- **finalize** = the deterministic batch capstone over the current
  corpus (chunk + pack + shards), so an incremental history that admits
  the same document set as a from-scratch build produces byte-identical
  shards (pinned in ``tests/test_incremental_pretrain.py``).

Scale shape: the digest diff joins 16-byte hashes (text never enters
the join); per update, curation/admission cost is proportional to the
CHANGED set; the fingerprint screen is the same broadcast-index shape
as the streaming capstone.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.fs import (
    delete_path,
    list_subdirs,
    mkdirs,
    path_exists,
    read_text,
    rename_overwrite,
    write_text,
)
from qualityassurancetool_spark.functions.hashing import normalize_text

# Every state-dir touch goes through the Hadoop-FS helpers, NOT
# os.path/open: a remote state_dir (hdfs://, s3a://) would otherwise
# read as empty — every refresh re-runs as "first update" against a
# local "s3a:/..." ghost tree while Spark writes the real slices
# remotely (review finding, round 8; same class as the streaming fix).


def _slices(spark, root: str) -> list[str]:
    return [
        posixpath.join(root, d)
        for d in list_subdirs(spark, root, prefix="upd=")
    ]


def _committed(spark, state_dir: str) -> int | None:
    """Id of the last COMMITTED update, or None.  The marker is the
    single commit point: slices and digests for upd > marker are
    in-flight garbage from a crashed attempt and are ignored by every
    reader."""
    marker = posixpath.join(state_dir, "LAST_COMMITTED")
    if path_exists(spark, marker):
        return int(read_text(spark, marker).strip())
    return None


def _next_upd(spark, state_dir: str) -> int:
    """Next update id from the COMMIT marker, not the slice listing: a
    crashed update (slices written, marker not advanced) is re-run
    under the SAME id, overwriting its own partial slices — the exact
    replay contract of the streaming capstone's batch ids."""
    c = _committed(spark, state_dir)
    return 0 if c is None else c + 1


def incremental_update(
    spark,
    new_snapshot: DataFrame,
    cfg,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 8,
    threshold: float = 0.5,
    classifier_model: tuple[list[float], float] | None = None,
) -> dict:
    """Apply one full-snapshot refresh to the state; returns the report
    dict (per-status diff counts, processed/admitted counts, update
    id).  ``cfg`` is a ``plans.curation.CurationConfig``."""
    from qualityassurancetool_spark.operators.fingerprint import (
        document_fingerprints,
        near_dedup_against_corpus,
    )
    from qualityassurancetool_spark.plans.curation import curate

    upd = _next_upd(spark, state_dir)
    dirs = {
        n: posixpath.join(state_dir, n)
        for n in ("seen", "corpus", "touched", "index")
    }
    for d in dirs.values():
        mkdirs(spark, d)

    # null text digests to a sentinel, not NULL: a NULL hash would make
    # the full-outer diff misread the doc as re-added every refresh
    # (NULL != NULL) or as removed while still present (review finding)
    new_digests = new_snapshot.select(
        F.col(id_col),
        F.coalesce(
            F.md5(normalize_text(F.col(text_col))),
            F.lit("__null_text__"),
        ).alias("content_hash"),
    )
    committed = _committed(spark, state_dir)
    seen_path = (
        posixpath.join(dirs["seen"], f"upd={committed}")
        if committed is not None
        else None
    )
    if seen_path is not None and path_exists(spark, seen_path):
        old = spark.read.parquet(seen_path).withColumnRenamed(
            "content_hash", "_old"
        )
        j = old.join(
            new_digests.withColumnRenamed("content_hash", "_new"),
            id_col,
            "full_outer",
        )
        status = (
            F.when(F.col("_old").isNull(), F.lit("added"))
            .when(F.col("_new").isNull(), F.lit("removed"))
            .when(F.col("_old") != F.col("_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
        )
        diff = j.select(id_col, status.alias("status"))
    else:  # first update: everything is an addition
        diff = new_digests.select(id_col, F.lit("added").alias("status"))
    diff = diff.persist()
    try:
        counts = {
            r["status"]: r["n"]
            for r in diff.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        work_ids = diff.where(
            F.col("status").isin("added", "changed")
        ).select(id_col)
        removed_ids = diff.where(F.col("status") == "removed").select(
            id_col
        )
        work = new_snapshot.join(work_ids, id_col, "left_semi").persist()
        try:
            # materialize BEFORE any state mutation: diff/work read the
            # seen/ digests lazily, and the roll-forward write below
            # would otherwise change what a later count() evaluates
            n_processed = work.count()
            decisions = curate(
                work, cfg, text_col=text_col, id_col=id_col,
                classifier_model=classifier_model,
            )
            kept = work.join(
                decisions.where("keep").select(id_col), id_col, "left_semi"
            )
            # shared helper: union of prior slices, EXCLUDING this
            # update's own (a crash replay must not screen documents
            # against the fingerprints its first attempt half-wrote)
            from qualityassurancetool_spark.operators.fingerprint import (
                read_fingerprint_index,
            )

            seen_fp = read_fingerprint_index(
                spark, dirs["index"], "upd=",
                exclude=f"upd={upd}", id_col=id_col,
                id_type=work.schema[id_col].dataType.simpleString(),
            )
            admissions = near_dedup_against_corpus(
                kept, seen_fp, text_col, id_col,
                k=k, w=w, threshold=threshold,
                # revision semantics: doc X's edit must not be rejected
                # against X's own prior fingerprints (review finding —
                # without this, every small edit permanently withdrew
                # the document via the latest-wins view)
                exclude_self_id=True,
            )
            admitted = kept.join(
                admissions.where("kept").select(id_col), id_col, "left_semi"
            )
            admitted.select(id_col, text_col).write.mode(
                "overwrite"
            ).parquet(posixpath.join(dirs["corpus"], f"upd={upd}"))
            work_ids.unionByName(removed_ids).write.mode(
                "overwrite"
            ).parquet(posixpath.join(dirs["touched"], f"upd={upd}"))
            # fingerprint the WRITTEN corpus slice (read-back), not the
            # lazy `admitted` frame — otherwise the whole curate +
            # admission DAG executes a second time (review finding; the
            # streaming twin reads its slices back for the same reason)
            admitted_back = spark.read.parquet(
                posixpath.join(dirs["corpus"], f"upd={upd}")
            )
            document_fingerprints(
                admitted_back, text_col, id_col, k=k, w=w
            ).write.mode("overwrite").parquet(
                posixpath.join(dirs["index"], f"upd={upd}")
            )
            # digests land in their OWN upd slice, then the marker
            # advances ATOMICALLY (tmp + rename) as the single commit
            # point.  A crash anywhere before the rename leaves the
            # marker at the previous update, so the replay re-diffs
            # against the COMMITTED digests and rewrites the same
            # slices — never an all-unchanged empty overwrite (review
            # finding on the old single-path seen/ layout).
            new_digests.write.mode("overwrite").parquet(
                posixpath.join(dirs["seen"], f"upd={upd}")
            )
            marker = posixpath.join(state_dir, "LAST_COMMITTED")
            write_text(spark, marker + ".part", str(upd))
            rename_overwrite(spark, marker + ".part", marker)
            # only the committed snapshot's digests are ever read again;
            # older seen slices are dead weight (one full digest set per
            # refresh otherwise — review finding).  The IMMEDIATELY
            # previous slice is kept as a one-step operator rollback
            # (regress the marker by one and the state replays).
            for pth in _slices(spark, dirs["seen"]):
                if int(posixpath.basename(pth).split("=", 1)[1]) < upd - 1:
                    delete_path(spark, pth)
            n_admitted = admitted_back.count()
            return {
                "update": upd,
                "diff": counts,
                "processed": n_processed,
                "admitted": n_admitted,
            }
        finally:
            work.unpersist()
    finally:
        diff.unpersist()


def current_corpus(spark, state_dir: str, id_col: str = "doc_id") -> DataFrame:
    """Latest-wins view over the update slices: each doc's admitted row
    from the last update that touched it; revisions that failed
    curation (touched without a newer admission) and removals drop
    out."""
    committed = _committed(spark, state_dir)
    if committed is None:
        raise ValueError(f"no committed updates under {state_dir}")

    def _upto(paths):
        # uncommitted (crashed in-flight) slices are invisible
        return [
            p
            for p in paths
            if int(posixpath.basename(p).split("=", 1)[1]) <= committed
        ]

    corpus_slices = _upto(_slices(spark, posixpath.join(state_dir, "corpus")))
    touched_slices = _upto(
        _slices(spark, posixpath.join(state_dir, "touched"))
    )
    if not corpus_slices:
        raise ValueError(f"no corpus slices under {state_dir}")

    def _with_upd(paths):
        parts = [
            spark.read.parquet(p).withColumn(
                "_upd",
                F.lit(int(posixpath.basename(p).split("=", 1)[1])),
            )
            for p in paths
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    corpus = _with_upd(corpus_slices)
    touched = _with_upd(touched_slices)
    last_touch = touched.groupBy(id_col).agg(
        F.max("_upd").alias("_last")
    )
    w_doc = Window.partitionBy(id_col).orderBy(F.desc("_upd"))
    latest_admitted = (
        corpus.withColumn("_rn", F.row_number().over(w_doc))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        latest_admitted.join(last_touch, id_col)
        .where(F.col("_upd") == F.col("_last"))
        .drop("_upd", "_last")
    )


def finalize_incremental(
    spark, state_dir: str, cfg, out_dir: str
) -> dict:
    """Deterministic batch finalization over the current corpus — the
    same md5-keyed capstone as streaming finalize, so equal admitted
    sets ⇒ byte-identical shards."""
    from qualityassurancetool_spark.plans.pretrain import (
        run_pretrain_pipeline,
    )

    return run_pretrain_pipeline(
        current_corpus(spark, state_dir), cfg, out_dir
    )

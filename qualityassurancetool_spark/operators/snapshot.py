"""Corpus snapshot diff: compare two versions of a document corpus by
content digest — the "what changed between yesterday's crawl and
today's" primitive behind incremental re-processing (only re-run
dedup/curation/embedding on ``added``/``changed`` docs) and dataset
version cards.  Complements ``quality_filters.corpus_drift`` (which
compares signal DISTRIBUTIONS without joining the corpora — this one
joins on identity and says exactly which docs moved).

Scale design (100 TB per snapshot):
 - both sides are projected to ``(doc_id, digest)`` BEFORE the join —
   16-byte md5 digests, never text, cross the one full-outer shuffle
   on ``doc_id``; with both snapshots bucketed by ``doc_id`` at
   landing (``sources/bucketing``) even that shuffle disappears;
 - the per-doc status sheet is the join output (no second pass);
   the summary is a low-cardinality group count on ``status``.

md5 digests over normalized text → bit-reproducible in DuckDB
(``tools/extra_oracles.py::x_snapshot_diff``).

Reference scope note: beyond-reference training-data family
(SURVEY §2b/2c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import normalize_text


def _digests(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("_dg"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc status sheet: ``(id_col, status)`` with status ∈
    {'added', 'removed', 'changed', 'unchanged'}."""
    o = _digests(old, text_col, id_col).withColumnRenamed("_dg", "_dg_old")
    n = _digests(new, text_col, id_col).withColumnRenamed("_dg", "_dg_new")
    j = o.join(n, on=id_col, how="full_outer")
    status = (
        F.when(F.col("_dg_old").isNull(), F.lit("added"))
        .when(F.col("_dg_new").isNull(), F.lit("removed"))
        .when(F.col("_dg_old") != F.col("_dg_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(id_col, status.alias("status"))


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """``(status, n)`` counts — low-cardinality group count."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))

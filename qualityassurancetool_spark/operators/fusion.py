"""Hybrid-retrieval rank fusion — combining sparse (BM25) and dense
(ANN) shortlists into one ranking.

The standard decontamination-audit / retrieval shape: run
``bm25.bm25_topk`` (lexical) and a ``similarity.*_topk`` (embedding)
over the same queries, then fuse.  Reciprocal Rank Fusion (Cormack,
Clarke & Buettcher, SIGIR 2009 — public literature) is the robust
default because it needs no score calibration between systems:

    RRF(d) = Σ_systems  w_s / (c + rank_s(d))

with ``c`` damping the head (60 in the paper), and documents absent
from a system's shortlist contributing 0.

Spark shape: shortlists are queries × k rows — corpus-scale work
happened UPSTREAM in the retrieval operators, so everything here is
metadata-scale.  Ranks are re-derived per system with a deterministic
(score desc, id asc) row_number (never trusting input order — a
DataFrame has none), the tagged union groups on (query, doc), and the
fused top-k is one more window.  No UDFs, no collects.

Cross-engine: ``tools/extra_oracles.py::x_rrf`` replicates the fusion
over real bm25 + embedding shortlists in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    shortlists: dict[str, DataFrame],
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    c: float = 60.0,
    weights: dict[str, float] | None = None,
    k: int = 10,
) -> DataFrame:
    """Fuse named shortlists → top-``k``
    ``(query_id, doc_id, rrf_score, n_sources)`` per query, ranked
    fused-score desc with doc-id tie-break (total deterministic order).

    Every shortlist must carry ``(query_id_col, id_col, score_col)``
    (rename upstream columns to this contract — e.g. alias
    ``neighbor_id``/``cosine`` from the ANN side).  ``weights`` maps
    shortlist name → multiplier (default 1.0 each).
    """
    if not shortlists:
        raise ValueError("need at least one shortlist")
    if c <= 0:
        raise ValueError("c must be positive")
    w = weights or {}
    unknown = set(w) - set(shortlists)
    if unknown:
        raise ValueError(f"weights for unknown shortlists: {sorted(unknown)}")

    tagged = None
    for name, df in shortlists.items():
        rank_w = Window.partitionBy(query_id_col).orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
        part = df.select(query_id_col, id_col, score_col).withColumn(
            "_contrib",
            F.lit(float(w.get(name, 1.0)))
            / (F.lit(float(c)) + F.row_number().over(rank_w)),
        )
        part = part.select(query_id_col, id_col, "_contrib")
        tagged = part if tagged is None else tagged.unionByName(part)

    fused = tagged.groupBy(query_id_col, id_col).agg(
        F.sum("_contrib").alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_sources"),
    )
    topk_w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("_rn", F.row_number().over(topk_w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_score_fuse(
    shortlists: dict[str, DataFrame],
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    weights: dict[str, float] | None = None,
    k: int = 10,
) -> DataFrame:
    """Score-level fusion alternative: per (query, system) min-max
    normalize scores to [0, 1], then weighted sum (missing ⇒ 0).
    Sensitive to score distributions where RRF is not — offered for
    callers whose systems are already calibrated.  Same output
    contract: ``(query_id, doc_id, fused_score, n_sources)``."""
    if not shortlists:
        raise ValueError("need at least one shortlist")
    w = weights or {}
    unknown = set(w) - set(shortlists)
    if unknown:
        raise ValueError(f"weights for unknown shortlists: {sorted(unknown)}")

    tagged = None
    for name, df in shortlists.items():
        norm_w = Window.partitionBy(query_id_col)
        s = F.col(score_col)
        lo, hi = F.min(s).over(norm_w), F.max(s).over(norm_w)
        normed = F.when(hi > lo, (s - lo) / (hi - lo)).otherwise(F.lit(1.0))
        part = df.select(query_id_col, id_col, score_col).withColumn(
            "_contrib", F.lit(float(w.get(name, 1.0))) * normed
        )
        part = part.select(query_id_col, id_col, "_contrib")
        tagged = part if tagged is None else tagged.unionByName(part)

    fused = tagged.groupBy(query_id_col, id_col).agg(
        F.sum("_contrib").alias("fused_score"),
        F.count(F.lit(1)).cast("int").alias("n_sources"),
    )
    topk_w = Window.partitionBy(query_id_col).orderBy(
        F.col("fused_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("_rn", F.row_number().over(topk_w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )

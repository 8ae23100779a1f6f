"""Corpus-wide frequent n-grams: the "what boilerplate does this crawl
contain" audit (C4's javascript/cookie-notice rules were found by
exactly this kind of count) and the input to auto-generated blocklists
and decontamination gram sets.

Scale design (100 TB corpus):
 - ONE explode of per-doc distinct k-grams (token arrays and shingles
   behind Generate barriers, the shared ``functions.hashing``
   discipline) → ONE partial-agged count shuffle → global top-k via
   ``orderBy().limit()`` = TakeOrdered (per-partition top-k + driver
   k-merge, no full sort);
 - gram STRINGS cross the shuffle here because the output is for human
   review / blocklist curation — when only ranks are needed at extreme
   scale, count hashed grams first and semi-join the top hashes back
   to recover strings (the decontam explode shape);
 - ``doc_frequency`` mode counts DISTINCT docs per gram (per-doc
   ``array_distinct`` makes the explode emit each (doc, gram) once, so
   a plain COUNT is the document frequency — no count-distinct state).

Tokenization is the corpus-standard normalize → whitespace split, so
the numbers line up with vocab/decontam/minhash; the chain is
engine-portable and DuckDB-checked
(``tools/extra_oracles.py::x_ngram_topk``).

Reference scope note: beyond-reference training-data family
(SURVEY §2b/2c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import (
    shingles_from_tokens,
    tokens,
)
from qualityassurancetool_spark.functions.partitioning import (
    compute_behind_barrier,
)


def doc_kgrams(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id_col, gram)`` — one row per DISTINCT k-gram per doc (docs
    with fewer than k tokens contribute their single short gram, the
    ``shingles_from_tokens`` convention)."""
    toked = compute_behind_barrier(
        df.select(F.col(id_col), F.col(text_col)),
        {"_tok": tokens(F.col(text_col))},
    )
    sh = compute_behind_barrier(
        toked, {"_sh": shingles_from_tokens(F.col("_tok"), k)}
    )
    return sh.select(id_col, F.explode("_sh").alias("gram")).where(
        F.length("gram") > 0
    )


def top_kgrams(
    df: DataFrame,
    k: int = 3,
    top: int = 100,
    by: str = "doc_frequency",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Global top-``top`` k-grams: ``(gram, n_docs)``, ranked by
    document frequency (ties broken by gram for a total order).
    ``by`` is fixed to document frequency for now — per-doc distinct
    grams make occurrence == doc count after the explode."""
    if by != "doc_frequency":
        raise ValueError(f"unsupported ranking {by!r}")
    counts = (
        doc_kgrams(df, k, text_col, id_col)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return counts.orderBy(F.desc("n_docs"), "gram").limit(top)


def boilerplate_grams(
    df: DataFrame,
    k: int = 3,
    min_doc_fraction: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Grams present in ≥ ``min_doc_fraction`` of all docs — blocklist /
    cleanup candidates.  The total doc count enters as a broadcast
    one-row crossJoin (one lazy plan, no driver action)."""
    counts = (
        doc_kgrams(df, k, text_col, id_col)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n_docs") >= F.col("_total") * F.lit(min_doc_fraction))
        .select(
            "gram",
            "n_docs",
            (F.col("n_docs") / F.col("_total")).alias("doc_fraction"),
        )
    )

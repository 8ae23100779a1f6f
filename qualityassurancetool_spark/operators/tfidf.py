"""TF-IDF term weighting and per-doc top-term extraction — the classic
corpus-statistics operator behind keyword extraction, near-duplicate
triage, and topic-balanced sampling in training-data pipelines.

Scale design (100 TB):
 - term frequencies come from ONE map-side token explode followed by a
   ``(doc, term)`` aggregation — the shuffle carries (doc_id, term_hash)
   pairs, never text bodies;
 - document frequencies reuse the SAME aggregated (doc, term) frame
   (a second, vocabulary-bounded aggregation on term alone — no second
   pass over the corpus);
 - idf joins back on the term key: vocabulary-scale × corpus-scale
   hash join, co-partitioned with the tf aggregation's output key so
   AQE plans it without an extra corpus shuffle;
 - per-doc top-k terms via struct-argmax aggregation (no global sort).

Weighting: tf = in-doc count, idf = ln((N+1)/(df+1)) + 1 (the smoothed
sklearn-style variant — never divides by zero, engine-portable
arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import tokens


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id_col, term, tf)`` — one row per distinct term per doc."""
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tok"))
        .select(id_col, F.explode_outer("_tok").alias("term"))
        .where(F.col("term").isNotNull() & (F.col("term") != ""))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    n_docs: int | None = None,
) -> DataFrame:
    """``(id_col, term, tf, df, tfidf)`` per distinct (doc, term).

    ``n_docs`` may be passed when the caller already knows the corpus
    size (saves the count job); otherwise counted once here.
    """
    tf = term_frequencies(df, text_col, id_col)
    n = n_docs if n_docs is not None else df.count()
    docfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    idf = F.log((F.lit(float(n + 1))) / (F.col("df") + 1)) + 1.0
    return tf.join(docfreq, "term").select(
        id_col,
        "term",
        "tf",
        "df",
        (F.col("tf") * idf).alias("tfidf"),
    )


def top_terms_per_doc(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Top-k terms per doc by tf-idf (ties broken by term for
    determinism): ``(id_col, term, rank, tfidf)``."""
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        tfidf(df, text_col, id_col, min_df)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "rank", "tfidf")
    )

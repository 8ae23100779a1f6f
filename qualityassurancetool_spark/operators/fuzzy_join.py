"""Fuzzy string join — q-gram Jaccard set-similarity join.

Entity resolution over short strings (titles, names, addresses — the
metadata side of corpus curation, where ``dedup.ngram_jaccard``'s
word-level shingles are too coarse: "Jon Smith" / "John Smith" share
zero word trigrams but most character trigrams).

Shape is the standard distributed set-similarity join (the SSJoin /
VernicaJoin family, public literature): explode each side's DISTINCT
padded character q-grams, equi-join on the gram (candidates = pairs
sharing ≥ 1 gram), count shared grams per pair with one partial-agged
groupBy, and compute Jaccard = common / (|A| + |B| − common) from the
per-side gram counts carried through the explode — set sizes travel as
ints, strings never join more than once per shared gram.  Stop-gram
capping (``max_df``) bounds the candidate blowup from ubiquitous grams
exactly like the fingerprint join's boilerplate cap: a gram appearing
in more than ``max_df`` right-side strings generates no candidates,
and set sizes are recomputed over the reduced gram universe so the
reported Jaccard stays consistent (see ``fuzzy_string_join``).

Cross-engine: ``tools/extra_oracles.py::x_fuzzy_join`` replicates the
gram definition with generate_series + substr in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import normalize_text

PAD = "\x01"  # boundary sentinel — stripped from input text below


def qgrams(c: Column, q: int = 3) -> Column:
    """Distinct padded character q-grams of the normalized string —
    ``q-1`` sentinel chars on each side, so every character
    participates in exactly q grams and single-char edits disturb at
    most q grams (the standard q-gram edit-distance bound).  The
    sentinel char is STRIPPED from the input first (crawled text
    carries stray control bytes): without that, an interior \\x01
    would forge boundary grams and inflate Jaccard between unrelated
    strings."""
    clean = F.replace(normalize_text(c), F.lit(PAD), F.lit(""))
    padded = F.concat(F.lit(PAD * (q - 1)), clean, F.lit(PAD * (q - 1)))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(padded) - (q - 1)),
            lambda i: F.substring(padded, i, q),
        )
    )


def _gram_side(
    df: DataFrame, id_col: str, text_col: str, q: int, prefix: str
) -> DataFrame:
    toked = df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        qgrams(F.col(text_col), q).alias("_gs"),
    )
    return toked.select(
        f"{prefix}_id",
        F.size("_gs").alias(f"{prefix}_n"),
        F.explode("_gs").alias("gram"),
    )


def fuzzy_string_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    threshold: float = 0.5,
    q: int = 3,
    left_id: str = "left_id",
    right_id: str = "right_id",
    max_df: int | None = 1000,
) -> DataFrame:
    """``(left_id, right_id, n_common, jaccard)`` for every cross-side
    pair whose padded q-gram Jaccard ≥ ``threshold`` (≥, matching the
    oracle).  Identical ids on both sides are NOT excluded — the
    caller filters self-pairs when joining a table to itself.

    ``max_df``: grams occurring in more than this many RIGHT-side
    strings are dropped on BOTH sides (the right side is the "index"
    side by convention — put the smaller / cleaner table there).  The
    reported ``jaccard`` is then the CONSISTENT Jaccard over the
    reduced gram universe: hot grams are removed from the per-side set
    sizes as well as from the intersection, so a pair of near-identical
    strings sharing a hot gram still scores ≈1 rather than being
    penalized for grams that could never be counted as common.  Recall
    is lost only for pairs whose reduced-universe similarity falls
    below ``threshold`` — in particular pairs ALL of whose shared
    grams are hot (reduced n_common = 0) generate no candidate at all."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    lg = _gram_side(left, left_id, left_col, q, "l")
    rg = _gram_side(right, right_id, right_col, q, "r")
    l_hot = r_hot = None
    if max_df is not None:
        hot = (
            rg.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_df)
            .select("gram")
        )
        # Per-id HOT counts (to subtract from the carried set sizes so
        # the Jaccard stays consistent over the reduced universe): the
        # semi-join keeps only hot rows, so this aggregation shuffles
        # an amount proportional to the hot-gram VOLUME, not the whole
        # exploded stream — and joins back onto the pairs frame (the
        # candidate-scale output), never onto the explode.
        l_hot = (
            lg.join(F.broadcast(hot), "gram", "leftsemi")
            .groupBy("l_id")
            .agg(F.count(F.lit(1)).alias("_l_hot"))
        )
        r_hot = (
            rg.join(F.broadcast(hot), "gram", "leftsemi")
            .groupBy("r_id")
            .agg(F.count(F.lit(1)).alias("_r_hot"))
        )
        lg = lg.join(F.broadcast(hot), "gram", "left_anti")
        rg = rg.join(F.broadcast(hot), "gram", "left_anti")
    pairs = (
        lg.join(rg, "gram")
        .groupBy("l_id", "r_id", "l_n", "r_n")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if max_df is not None:
        pairs = (
            pairs.join(l_hot, "l_id", "left")
            .join(r_hot, "r_id", "left")
            .withColumn(
                "l_n", F.col("l_n") - F.coalesce(F.col("_l_hot"), F.lit(0))
            )
            .withColumn(
                "r_n", F.col("r_n") - F.coalesce(F.col("_r_hot"), F.lit(0))
            )
            .drop("_l_hot", "_r_hot")
        )
    jac = F.col("n_common") / (
        F.col("l_n") + F.col("r_n") - F.col("n_common")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= F.lit(float(threshold)))
        .select(
            F.col("l_id").alias(left_id),
            F.col("r_id").alias(right_id),
            "n_common",
            "jaccard",
        )
    )

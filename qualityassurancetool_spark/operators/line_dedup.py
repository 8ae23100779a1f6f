"""Line-level corpus cleaning: C4-style line/page rules (Raffel et al.
2020 §2.2) and CCNet-style cross-document duplicate-line removal
(Wenzek et al. 2020 — dedup of repeated boilerplate lines/paragraphs
across the whole corpus, not just within one doc; the intra-doc variant
lives in ``quality_filters.dedup_lines``).

Scale design (100 TB corpus):
 - C4 rules are 100 % row-local: split → per-line predicate →
   ``filter``/``concat_ws`` rebuild, pure Columns, zero shuffle;
 - cross-corpus line dedup shuffles ONLY ``(line_hash, doc_id, idx)``
   (8-byte md5-derived hash + two ints — the line text never enters a
   shuffle): keep-first is a ``min(struct(doc_id, idx))`` partial agg
   per hash; the loser set (doc_id, idx of every removed occurrence) is
   aggregated to per-doc drop-index arrays and joined back to the
   corpus, where the rebuild re-splits row-locally and drops by index;
 - only docs that actually LOSE a line appear on the join's right side
   — for real corpora duplicated boilerplate is concentrated, so the
   right side is far smaller than the corpus and frequently
   broadcastable; untouched docs pass through a left join + coalesce
   without rewriting; with the corpus bucketed by ``doc_id``
   (``sources/bucketing``) even the non-broadcast join avoids
   shuffling text.

Both operators are md5-based → bit-reproducible in DuckDB
(``tools/extra_oracles.py::x_c4_lines`` / ``x_corpus_line_dedup``).

Reference scope note: beyond-reference training-data family
(SURVEY §2b/2c); the reference QC tool has no text surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import md5_long

LINE_SALT = "cl:"

# C4 §2.2 line keep-rule: ends in terminal punctuation (optionally
# followed by a closing quote), has >= 3 words, does not mention
# javascript (the classic cookie/JS boilerplate tell).
TERMINAL_PUNCT_RE = r'[.!?]["’\']?$'
C4_MIN_LINE_WORDS = 3
# C4 page drops: lorem ipsum placeholder text, raw code ({), and pages
# left with fewer than min_lines kept lines (C4 uses 5 sentences; at
# line granularity the same spirit).
C4_PAGE_BLOCKLIST = ("lorem ipsum", "{")
C4_MIN_KEPT_LINES = 1


def split_lines(text: Column) -> Column:
    """Raw line array (split on newline; no trimming — positions must
    survive the round trip)."""
    return F.split(text, "\n")


def c4_line_keep(line: Column, min_words: int = C4_MIN_LINE_WORDS) -> Column:
    """Per-line C4 keep predicate (pure Column)."""
    t = F.trim(line)
    words = F.size(F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0))
    return (
        (F.length(F.regexp_extract(t, TERMINAL_PUNCT_RE, 0)) > 0)
        & (words >= min_words)
        & ~F.lower(t).contains("javascript")
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = C4_MIN_LINE_WORDS,
    min_kept_lines: int = C4_MIN_KEPT_LINES,
) -> DataFrame:
    """C4 line+page cleaning: rebuild each doc from its kept lines and
    flag page-level drops.  Output: ``(id_col, clean_text, n_lines,
    n_kept, page_drop)`` — ``page_drop`` is true for blocklist hits
    (lorem ipsum / '{') or pages with fewer than ``min_kept_lines``
    surviving lines.  Entirely row-local (zero shuffle)."""
    lines = split_lines(F.col(text_col))
    kept = F.filter(lines, lambda ln: c4_line_keep(ln, min_words))
    lower = F.lower(F.col(text_col))
    block = F.lit(False)
    for phrase in C4_PAGE_BLOCKLIST:
        block = block | lower.contains(phrase)
    return df.select(
        id_col,
        F.concat_ws("\n", kept).alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        (block | (F.size(kept) < min_kept_lines)).alias("page_drop"),
    )


def line_occurrences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_chars: int = 10,
) -> DataFrame:
    """Exploded dedup-eligible line occurrences:
    ``(id_col, idx, line_hash)``.  Lines shorter than ``min_line_chars``
    after trimming (headers, blanks, list bullets) are NOT
    dedup-eligible — hashing them would make the first doc in the
    corpus own every blank line.  Only the md5-derived 60-bit hash
    leaves the row; the line text never enters a shuffle."""
    lines = df.select(
        F.col(id_col), F.posexplode(split_lines(F.col(text_col)))
    ).select(
        id_col,
        F.col("pos").alias("idx"),
        F.trim("col").alias("_t"),
    )
    return lines.where(F.length("_t") >= min_line_chars).select(
        id_col,
        "idx",
        md5_long(F.col("_t"), salt=LINE_SALT).alias("line_hash"),
    )


def corpus_line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_chars: int = 10,
) -> DataFrame:
    """Cross-document duplicate-line removal, keep-first semantics
    (first = smallest ``(doc_id, idx)`` — deterministic under re-runs).

    Output: the input columns with ``text_col`` rewritten to the
    surviving lines, plus ``n_dup_lines_removed``.  See module
    docstring for the shuffle budget."""
    occ = line_occurrences(df, text_col, id_col, min_line_chars)
    # keep-first per hash: one partial-agged shuffle on the 8-byte hash
    keeper = occ.groupBy("line_hash").agg(
        F.min(F.struct(id_col, "idx")).alias("k"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    # losers = every occurrence that is not its hash's keeper.  The
    # join key IS the groupBy key, so the shuffle partitioning is
    # reused (no second full shuffle of occ); keeper is filtered to
    # actually-duplicated hashes first, which is the small side.
    losers = (
        occ.join(keeper.where(F.col("n_occ") > 1), "line_hash")
        .where(
            (F.col(id_col) != F.col(f"k.{id_col}"))
            | (F.col("idx") != F.col("k.idx"))
        )
        .select(id_col, "idx")
    )
    drops = losers.groupBy(id_col).agg(
        F.sort_array(F.collect_list("idx")).alias("_drop_idx")
    )
    joined = df.join(drops, on=id_col, how="left")
    lines = split_lines(F.col(text_col))
    rebuilt = F.when(
        F.col("_drop_idx").isNull(), F.col(text_col)
    ).otherwise(
        F.concat_ws(
            "\n",
            F.filter(
                lines,
                lambda ln, i: ~F.array_contains(F.col("_drop_idx"), i),
            ),
        )
    )
    out_cols = [
        rebuilt.alias(text_col) if c == text_col else F.col(c)
        for c in df.columns
    ]
    return joined.select(
        *out_cols,
        # size(NULL) is -1 under Spark's legacy sizeOfNull — branch, don't coalesce
        F.when(F.col("_drop_idx").isNull(), F.lit(0))
        .otherwise(F.size("_drop_idx"))
        .alias("n_dup_lines_removed"),
    )

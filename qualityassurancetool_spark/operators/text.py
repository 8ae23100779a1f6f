"""Text-analysis operators for corpus pipelines: language ID, quality
scoring, token counting, document fingerprinting.  All pure Column
expressions (JVM-side, codegen) — no UDFs in the hot path — and every
building block has an exact ANSI-SQL rendering for oracle checks.

Expression-shape rules (the difference between O(1) and O(markers)
regexp passes per row):

- every builder takes ``normalized=True`` to skip its internal
  ``normalize_text``; hot paths materialize the normalized text ONCE in
  its own projection (``analyze`` does this) and pass the attribute —
  otherwise the regexp subtree is copied into each of the ~25
  marker-word counters;
- language argmax is a single ``greatest`` over (score, -index) structs,
  not a per-language CASE fold: the fold nests each score expression
  into every later comparison (the tree doubles per language), which
  multiplied analysis/codegen time for every query touching lang-ID.
Result values are identical either way (same strict-> tie semantics:
earliest sorted language wins ties, zero score → default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import normalize_text

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "una", "es"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def _norm_of(text: Column, normalized: bool) -> Column:
    return text if normalized else normalize_text(text)


def _count_word(norm: Column, word: str) -> Column:
    """Occurrences of a whole word in already-normalized text — portable
    via split-on-delimiter: (len(x) - len(replace(x, w, ''))) / len(w)
    over the padded text."""
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
        / F.lit(len(needle) - 1)
    ).cast("int")


def lang_scores(text: Column, normalized: bool = False) -> dict[str, Column]:
    norm = _norm_of(text, normalized)
    return {
        lang: sum(
            (_count_word(norm, w) for w in words), start=F.lit(0)
        )
        for lang, words in LANG_MARKERS.items()
    }


def predict_lang(
    text: Column, default: str = "und", normalized: bool = False
) -> Column:
    """argmax over marker-word counts; ties and zero-score → default.
    Deterministic: earliest language in sorted order wins ties (same
    semantics as a strict-> fold over sorted languages)."""
    norm = _norm_of(text, normalized)
    langs = sorted(LANG_MARKERS)
    scores = [
        sum((_count_word(norm, w) for w in LANG_MARKERS[lang]), start=F.lit(0))
        for lang in langs
    ]
    pairs = [
        F.struct(
            F.coalesce(s, F.lit(0)).alias("s"), F.lit(-i).alias("ni")
        )
        for i, s in enumerate(scores)
    ]
    best = F.greatest(*pairs)
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    return F.when(
        best["s"] > 0, F.element_at(lang_arr, -best["ni"] + 1)
    ).otherwise(F.lit(default))


def token_count(text: Column, normalized: bool = False) -> Column:
    """Whitespace token count (empty text → 0)."""
    norm = _norm_of(text, normalized)
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit(""))) + 1
    )


def word_stats(text: Column, normalized: bool = False) -> dict[str, Column]:
    norm = _norm_of(text, normalized)
    n_tok = token_count(norm, normalized=True)
    n_chars = F.length(norm)
    return {
        "n_tokens": n_tok,
        "n_chars_norm": n_chars,
        "avg_token_len": F.when(
            n_tok > 0, (n_chars - (n_tok - 1)) / n_tok
        ).cast("double"),
    }


def quality_score(
    text: Column,
    stopwords: list[str] | None = None,
    normalized: bool = False,
) -> Column:
    """Heuristic [0,1] quality score: reasonable length, reasonable average
    word length, some stopword mass.  The exact formula is arbitrary but
    fixed — oracle-reproducible."""
    norm = _norm_of(text, normalized)
    sw = stopwords or LANG_MARKERS["en"]
    stats = word_stats(norm, normalized=True)
    n_tok = stats["n_tokens"].cast("double")
    awl = F.coalesce(stats["avg_token_len"], F.lit(0.0))
    sw_count = sum((_count_word(norm, w) for w in sw), start=F.lit(0)).cast(
        "double"
    )
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    awl_score = F.when((awl >= 3.0) & (awl <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    sw_score = F.least(
        sw_count / F.greatest(n_tok, F.lit(1.0)) * F.lit(5.0), F.lit(1.0)
    )
    return (len_score * 0.4 + awl_score * 0.3 + sw_score * 0.3).alias(
        "quality_score"
    )


def fingerprint(text: Column, normalized: bool = False) -> Column:
    """Canonical-form digest: md5 over (lowercased, whitespace-collapsed,
    sorted-distinct tokens) — robust to reordering and repetition."""
    norm = _norm_of(text, normalized)
    toks = F.array_sort(F.array_distinct(F.split(norm, " ")))
    return F.md5(F.concat_ws(" ", toks))


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full per-document analysis.  The normalized text is materialized in
    its own projection so every downstream counter reads an attribute —
    exactly one regexp pass per row."""
    withn = df.withColumn("_norm", normalize_text(F.col(text_col)))
    n = F.col("_norm")
    stats = word_stats(n, normalized=True)
    return withn.select(
        *df.columns,
        predict_lang(n, normalized=True).alias("predicted_lang"),
        stats["n_tokens"].alias("n_tokens"),
        stats["avg_token_len"].alias("avg_token_len"),
        quality_score(n, normalized=True).alias("quality_score"),
        fingerprint(n, normalized=True).alias("fingerprint"),
    )

"""Text-analysis operators for corpus pipelines: language ID, quality
scoring, token counting, document fingerprinting.  All pure Column
expressions (JVM-side, codegen) — no UDFs in the hot path — and every
building block has an exact ANSI-SQL rendering for oracle checks.
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


def _count_word(text: Column, word: str) -> Column:
    """Occurrences of a whole word — portable via split-on-delimiter:
    (len(x) - len(replace(x, w, ''))) / len(w) over the padded text."""
    padded = F.concat(F.lit(" "), normalize_text(text), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
        / F.lit(len(needle) - 1)
    ).cast("int")


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum(
            (_count_word(text, w) for w in words), start=F.lit(0)
        )
        for lang, words in LANG_MARKERS.items()
    }


def predict_lang(text: Column, default: str = "und") -> Column:
    """argmax over marker-word counts; ties and zero-score → default.
    Deterministic: languages compared in sorted order."""
    scores = lang_scores(text)
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang in sorted(scores):
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def token_count(text: Column) -> Column:
    """Whitespace token count (empty text → 0)."""
    norm = normalize_text(text)
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit(""))) + 1
    )


def word_stats(text: Column) -> dict[str, Column]:
    norm = normalize_text(text)
    n_tok = token_count(text)
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
) -> Column:
    """Heuristic [0,1] quality score: reasonable length, reasonable average
    word length, some stopword mass.  The exact formula is arbitrary but
    fixed — oracle-reproducible."""
    sw = stopwords or LANG_MARKERS["en"]
    stats = word_stats(text)
    n_tok = stats["n_tokens"].cast("double")
    awl = F.coalesce(stats["avg_token_len"], F.lit(0.0))
    sw_count = sum((_count_word(text, w) for w in sw), start=F.lit(0)).cast(
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


def fingerprint(text: Column) -> Column:
    """Canonical-form digest: md5 over (lowercased, whitespace-collapsed,
    sorted-distinct tokens) — robust to reordering and repetition."""
    toks = F.array_sort(
        F.array_distinct(F.split(normalize_text(text), " "))
    )
    return F.md5(F.concat_ws(" ", toks))


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    stats = word_stats(t)
    return df.select(
        "*",
        predict_lang(t).alias("predicted_lang"),
        stats["n_tokens"].alias("n_tokens"),
        stats["avg_token_len"].alias("avg_token_len"),
        quality_score(t).alias("quality_score"),
        fingerprint(t).alias("fingerprint"),
    )

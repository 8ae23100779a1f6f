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
    over the padded text.  NB: adjacent repeats share their delimiter and
    undercount (" the the " counts 1) — the token-array path
    (:func:`lang_score_struct`) counts each occurrence and is the hot-path
    form; this stays for compatibility with delimiter-counting oracles."""
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
        / F.lit(len(needle) - 1)
    ).cast("int")


def lang_score_struct(toks: Column) -> Column:
    """All per-language marker counts in ONE pass over a materialized
    token array: a single ``aggregate`` whose accumulator is a struct of
    per-language counters (each token does |langs|·|markers| equality
    checks — ~25 — instead of the 25 full-string replace passes of the
    delimiter-count form).  Cold codegen is ~3.5× smaller and warm
    per-row work ~2× cheaper (measured at sf0.1); at 100 TB this is the
    difference between one scan of the text and 25.

    Attribute-only contract: pass a *materialized* token-array column —
    inlining ``split(...)`` here would copy it into the lambda (no CSE
    inside HOF lambdas).
    """
    langs = sorted(LANG_MARKERS)
    zero = F.struct(*[F.lit(0).alias(lang) for lang in langs])

    def step(acc: Column, t: Column) -> Column:
        return F.struct(
            *[
                (
                    acc[lang]
                    + F.when(t.isin(LANG_MARKERS[lang]), 1).otherwise(0)
                ).alias(lang)
                for lang in langs
            ]
        )

    return F.aggregate(toks, zero, step)


def predict_lang_from_scores(scores: Column, default: str = "und") -> Column:
    """argmax over a materialized :func:`lang_score_struct` column; ties
    and zero-score → default (earliest sorted language wins ties)."""
    langs = sorted(LANG_MARKERS)
    pairs = [
        F.struct(
            F.coalesce(scores[lang], F.lit(0)).alias("s"),
            F.lit(-i).alias("ni"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.greatest(*pairs)
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    return F.when(
        best["s"] > 0, F.element_at(lang_arr, -best["ni"] + 1)
    ).otherwise(F.lit(default))


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
    """argmax over marker-word token counts; ties and zero-score →
    default.  Inline convenience form (splits the text itself — the
    split is copied per score expression); hot paths materialize the
    token array + :func:`lang_score_struct` in their own projections and
    call :func:`predict_lang_from_scores`."""
    norm = _norm_of(text, normalized)
    return predict_lang_from_scores(
        lang_score_struct(F.split(norm, " ")), default
    )


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


def quality_score_parts(
    n_tokens: Column, avg_token_len: Column, stopword_count: Column
) -> Column:
    """The quality formula over already-materialized ingredients (hot-path
    form): reasonable length, reasonable average word length, some
    stopword mass.  The exact formula is arbitrary but fixed —
    oracle-reproducible."""
    n_tok = n_tokens.cast("double")
    awl = F.coalesce(avg_token_len, F.lit(0.0))
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    awl_score = F.when((awl >= 3.0) & (awl <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    # null-text docs carry a NULL stopword count; F.least SKIPS nulls,
    # so without the coalesce they scored sw=1.0 and OUTSCORED empty
    # docs ~3x (review finding, round 8)
    sw_score = F.least(
        F.coalesce(stopword_count.cast("double"), F.lit(0.0))
        / F.greatest(n_tok, F.lit(1.0))
        * F.lit(5.0),
        F.lit(1.0),
    )
    return (len_score * 0.4 + awl_score * 0.3 + sw_score * 0.3).alias(
        "quality_score"
    )


def quality_score(
    text: Column,
    stopwords: list[str] | None = None,
    normalized: bool = False,
) -> Column:
    """Inline convenience form of :func:`quality_score_parts`.  The
    stopword count is token-based (counts adjacent repeats, unlike the
    delimiter-count form); the default stopword set is the English marker
    lexicon, so hot paths reuse the ``en`` field of a materialized
    :func:`lang_score_struct`."""
    norm = _norm_of(text, normalized)
    stats = word_stats(norm, normalized=True)
    sw = stopwords or LANG_MARKERS["en"]
    toks = F.split(norm, " ")
    sw_count = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return quality_score_parts(
        stats["n_tokens"], stats["avg_token_len"], sw_count
    )


def fingerprint(text: Column, normalized: bool = False) -> Column:
    """Canonical-form digest: md5 over (lowercased, whitespace-collapsed,
    sorted-distinct tokens) — robust to reordering and repetition."""
    norm = _norm_of(text, normalized)
    toks = F.array_sort(F.array_distinct(F.split(norm, " ")))
    return F.md5(F.concat_ws(" ", toks))


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full per-document analysis in three staged projections — each
    stage materializes what the next reads as an attribute (normalized
    text → token array → one-pass language scores), so the text is
    regexp-normalized once, split once, and scanned once for all marker
    counts."""
    withn = df.withColumn("_norm", normalize_text(F.col(text_col)))
    n = F.col("_norm")
    witht = withn.withColumn("_toks", F.split(n, " "))
    withs = witht.withColumn("_ls", lang_score_struct(F.col("_toks")))
    # null text counts 0 tokens like empty text — size(NULL) is the
    # legacy -1 sentinel and leaked into the public n_tokens column
    # (review finding, round 8)
    n_tok = F.when(
        F.length(n).isNull() | (F.length(n) == 0), F.lit(0)
    ).otherwise(F.size(F.col("_toks")))
    n_chars = F.length(n)
    awl = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).cast("double")
    return withs.select(
        *df.columns,
        predict_lang_from_scores(F.col("_ls")).alias("predicted_lang"),
        n_tok.alias("n_tokens"),
        awl.alias("avg_token_len"),
        quality_score_parts(n_tok, awl, F.col("_ls.en")).alias(
            "quality_score"
        ),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(F.col("_toks"))))
        ).alias("fingerprint"),
    )


# --------------------------------------------------------- script profile

# Unicode block ranges as literal character classes — the ranges are
# embedded as actual codepoints so the SAME pattern string is valid in
# Java regex (Spark) and RE2 (DuckDB); \p{script=...} syntax differs
# between engines and is avoided.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "a-zA-Z",
    "cjk": "一-鿿",
    "kana": "぀-ヿ",
    "hangul": "가-힯",
    "cyrillic": "Ѐ-ӿ",
    "arabic": "؀-ۿ",
    "devanagari": "ऀ-ॿ",
    "greek": "Ͱ-Ͽ",
}


def script_counts(text: Column) -> dict[str, Column]:
    """Per-script character counts (one ``regexp_count`` each — pure
    Columns, engine-portable literal ranges)."""
    return {
        name: F.regexp_count(text, F.lit(f"[{rng}]"))
        for name, rng in SCRIPT_RANGES.items()
    }


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_chars, <script> counts…, dominant_script): writing-system
    detection by codepoint-block counting — the cheap, deterministic
    complement to the word-list language scorer (a zh/ja/ko/ru/ar doc is
    identified by its script long before any word list matches; mixed-
    script docs expose their ratio).  ``dominant_script`` is the argmax
    with ties broken by the declared SCRIPT_RANGES order; documents with
    no counted characters get 'none'."""
    t = F.col(text_col)
    counts = script_counts(t)
    out = df.select(
        F.col(id_col), F.length(t).alias("n_chars"),
        *[c.cast("long").alias(k) for k, c in counts.items()],
    )
    names = list(SCRIPT_RANGES)
    best_n = F.greatest(*[F.col(k) for k in names])
    dom = F.lit("none")
    for name in reversed(names):
        dom = F.when(
            (best_n > 0) & (F.col(name) == best_n), F.lit(name)
        ).otherwise(dom)
    return out.withColumn("dominant_script", dom)

"""Repetition / PII quality signals for corpus curation (Gopher-rule
family: duplicate-line fraction, top-bigram fraction, word repetition,
symbol ratio; plus conservative PII detectors).  Everything is a pure
Column expression — JVM-side, whole-stage codegen, no UDFs — and every
signal has an exact DuckDB rendering for the oracle gate.

Scale notes: all signals are row-local (no shuffle); the token-array
signals follow the attribute-only contract (materialize tokens once, pass
the attribute — no CSE inside HOF lambdas).  ``top_bigram_fraction`` is
O(distinct-bigrams × bigrams) per row — fine for documents, cap the
input length upstream for pathological rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import normalize_text

# conservative patterns valid (and identical in semantics) in both Java
# regex and RE2 — no backrefs, no lookaround
EMAIL_PAT = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_PAT = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"
IPV4_PAT = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
SYMBOL_PAT = r"[^a-z0-9\s]"


def dup_line_fraction(text: Column) -> Column:
    """Fraction of lines that are duplicates of an earlier line (Gopher
    repetition rule): 1 − distinct/total over newline-split lines."""
    lines = F.split(text, "\n")
    n = F.size(lines)
    return F.when(n > 0, 1.0 - F.size(F.array_distinct(lines)) / n).otherwise(
        F.lit(0.0)
    )


def word_rep_ratio(toks: Column) -> Column:
    """1 − distinct/total over the token array (0 for empty docs)."""
    n = F.size(toks)
    return F.when(n > 0, 1.0 - F.size(F.array_distinct(toks)) / n).otherwise(
        F.lit(0.0)
    )


def top_bigram_fraction(toks: Column) -> Column:
    """Occurrences of the most frequent word bigram / total bigrams
    (Gopher top-2-gram rule); 0 when fewer than 2 tokens."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1)))
    bg = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    top = F.array_max(
        F.transform(
            F.array_distinct(bg),
            lambda x: F.size(F.filter(bg, lambda y: y == x)),
        )
    )
    return F.when(n >= 2, top / F.size(bg)).otherwise(F.lit(0.0))


def symbol_ratio(lower_text: Column) -> Column:
    """Non-alphanumeric, non-whitespace characters / total characters."""
    n = F.length(lower_text)
    return F.when(
        n > 0, F.regexp_count(lower_text, F.lit(SYMBOL_PAT)) / n
    ).otherwise(F.lit(0.0))


def pii_counts(lower_text: Column) -> dict[str, Column]:
    """Conservative PII detector counts (emails, phone-ish numbers, IPv4).
    Counting, not scrubbing — the scrub is ``regexp_replace`` with the
    same patterns where a pipeline needs redaction."""
    return {
        "pii_emails": F.regexp_count(lower_text, F.lit(EMAIL_PAT)),
        "pii_phones": F.regexp_count(lower_text, F.lit(PHONE_PAT)),
        "pii_ipv4": F.regexp_count(lower_text, F.lit(IPV4_PAT)),
    }


def quality_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Wide per-document signal frame: one column per signal.  Staged
    projections (text → lower/norm → tokens) keep every expensive
    intermediate evaluated once per row."""
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        t,
        # null text lowers to '' so the pii regexp counts read 0 like
        # every other signal — regexp_count(NULL) yielded NULL pii_*
        # next to 0.0-valued ratios, and drift percentiles then
        # silently dropped null-text docs from the pii quantiles while
        # counting them everywhere else (review finding, round 8;
        # gopher_signals already coalesces)
        F.coalesce(F.lower(t), F.lit("")).alias("_lt"),
        normalize_text(t).alias("_qnorm"),
    ).withColumn("_qtoks", F.split(F.col("_qnorm"), " "))
    toks = F.col("_qtoks")
    lt = F.col("_lt")
    pii = pii_counts(lt)
    return staged.select(
        F.col(id_col),
        dup_line_fraction(t).alias("dup_line_fraction"),
        word_rep_ratio(toks).alias("word_rep_ratio"),
        top_bigram_fraction(toks).alias("top_bigram_fraction"),
        symbol_ratio(lt).alias("symbol_ratio"),
        *[c.cast("double").alias(k) for k, c in pii.items()],
    )


# ------------------------------------------------------------ Gopher rules

# Rae et al. 2021 (Gopher), §A.1.1 — the published page-filter
# thresholds.  Public literature; the same rule set Dolma/RedPajama
# reuse.  The required-stopword list is the paper's.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_DEFAULTS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,   # '#' and '…'/'...' per word
    "max_bullet_line_frac": 0.9,    # lines starting with a bullet
    "max_ellipsis_line_frac": 0.3,  # lines ending with an ellipsis
    "min_alpha_word_frac": 0.8,     # words containing >= 1 letter
    "min_stopword_hits": 2,         # distinct required stopwords
}


def gopher_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher §A.1.1 signal frame — pure Columns, row-local,
    no shuffle.  Word signals run over the corpus-standard normalized
    token array; line signals over raw ``\\n`` lines with leading/
    trailing spaces trimmed (bullets are detected post-trim).  Exact
    DuckDB rendering in ``tools/extra_oracles.py::x_gopher``."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    staged = df.select(
        F.col(id_col),
        t.alias("_t"),
        F.filter(
            F.split(normalize_text(t), " "), lambda w: F.length(w) > 0
        ).alias("_w"),
        F.transform(
            F.split(t, "\n"), lambda ln: F.trim(ln)
        ).alias("_ln"),
    )
    sig = gopher_signal_columns(F.col("_t"), F.col("_w"), F.col("_ln"))
    return staged.select(
        F.col(id_col), *[c.alias(k) for k, c in sig.items()]
    )


def gopher_signal_columns(t: Column, w: Column, ln: Column) -> dict:
    """The seven Gopher signal Columns from pre-staged attributes —
    ``t`` raw text, ``w`` NON-EMPTY normalized tokens, ``ln`` trimmed
    lines (attribute-only contract: callers materialize the arrays once
    behind a barrier and pass the attributes).  Shared by
    :func:`gopher_signals` and the curation plan's ``gopher_rules``
    measures."""
    n_words = F.size(w)
    nonempty = F.filter(ln, lambda x: F.length(x) > 0)
    n_lines = F.size(nonempty)
    # '#' count + ellipsis count ('…' or '...'; the 3-char form counted
    # by length delta / 3 so '......' counts twice, like a regex scan)
    hashes = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    dots = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / 3
    uni = F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    bullet = F.size(
        F.filter(
            nonempty,
            lambda x: x.startswith("•")
            | x.startswith("-")
            | x.startswith("*"),
        )
    )
    ellipsis_end = F.size(
        F.filter(nonempty, lambda x: x.endswith("...") | x.endswith("…"))
    )
    alpha_words = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(w),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    return {
        "n_words": n_words,
        "mean_word_len": F.when(
            n_words > 0,
            F.aggregate(
                w, F.lit(0), lambda acc, x: acc + F.length(x)
            ).cast("double")
            / n_words,
        ).otherwise(F.lit(0.0)),
        "symbol_word_ratio": F.when(
            n_words > 0, (hashes + dots + uni) / n_words
        ).otherwise(F.lit(0.0)),
        "bullet_line_frac": F.when(n_lines > 0, bullet / n_lines).otherwise(
            F.lit(0.0)
        ),
        "ellipsis_line_frac": F.when(
            n_lines > 0, ellipsis_end / n_lines
        ).otherwise(F.lit(0.0)),
        "alpha_word_frac": F.when(
            n_words > 0, alpha_words / n_words
        ).otherwise(F.lit(0.0)),
        "stopword_hits": stop_hits.cast("int"),
    }


def gopher_fail_expr(
    thresholds: dict | None = None, prefix: str = ""
) -> Column:
    """First-failed-rule name Column (null = kept), published rule
    order, reading the seven signal columns by name — usable over a
    :func:`gopher_signals` frame OR any frame that carries the same
    columns.  ``prefix`` renames the columns it reads: the curation
    plan stages its internal signals under ``_g_`` so a caller's own
    ``n_words`` column is never shadowed or duplicated (review
    finding, round 9)."""
    th = {**GOPHER_DEFAULTS, **(thresholds or {})}

    def c(name: str) -> Column:
        return F.col(prefix + name)

    rules = [
        ("n_words_low", c("n_words") < th["min_words"]),
        ("n_words_high", c("n_words") > th["max_words"]),
        (
            "mean_word_len",
            (c("mean_word_len") < th["min_mean_word_len"])
            | (c("mean_word_len") > th["max_mean_word_len"]),
        ),
        (
            "symbol_ratio",
            c("symbol_word_ratio") > th["max_symbol_word_ratio"],
        ),
        (
            "bullet_lines",
            c("bullet_line_frac") > th["max_bullet_line_frac"],
        ),
        (
            "ellipsis_lines",
            c("ellipsis_line_frac") > th["max_ellipsis_line_frac"],
        ),
        (
            "alpha_words",
            c("alpha_word_frac") < th["min_alpha_word_frac"],
        ),
        (
            "stopwords",
            c("stopword_hits") < th["min_stopword_hits"],
        ),
    ]
    fail = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        fail = F.when(cond, F.lit(name)).otherwise(fail)
    return fail


def gopher_keep(
    signals: DataFrame, thresholds: dict | None = None
) -> DataFrame:
    """``(id, signals..., gopher_fail, keep)`` verdicts over a
    :func:`gopher_signals` frame; ``gopher_fail`` names the FIRST failed
    rule in the published order (null when kept)."""
    return signals.select(
        *signals.columns,
        gopher_fail_expr(thresholds).alias("gopher_fail"),
    ).withColumn("keep", F.col("gopher_fail").isNull())


# ---------------------------------------------------------------- redaction

REDACT_ORDER = [
    # (pattern, placeholder, case_insensitive) — EMAIL must run first:
    # an address like user.10.0.0.1@host would otherwise have its digits
    # eaten by the IPv4 pass and stop matching EMAIL_PAT.  IPv4 before
    # PHONE so dotted quads are typed <IP>, not swallowed into a phone
    # run (the phone charset excludes '.', but a quad adjacent to digits
    # could extend one).
    (EMAIL_PAT, "<EMAIL>", True),
    (IPV4_PAT, "<IP>", False),
    (PHONE_PAT, "<PHONE>", False),
]


def redact_pii(text: Column) -> Column:
    """Typed-placeholder PII scrub: emails → <EMAIL>, dotted quads →
    <IP>, phone-ish digit runs → <PHONE>, applied in REDACT_ORDER.

    Pure ``regexp_replace`` chain — row-local, JVM-side, identical
    semantics in DuckDB (same RE2-safe patterns as the counting
    signals; email matching is case-insensitive via ``(?i)``)."""
    out = text
    for pat, repl, ci in REDACT_ORDER:
        out = F.regexp_replace(out, ("(?i)" if ci else "") + pat, repl)
    return out


def redact_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, redacted, n_redacted_{emails,ipv4,phones}) — the scrub plus a
    pre-redaction audit count per type (what a compliance report needs:
    how much PII was removed, per document).  Counts are taken on the
    ORIGINAL lowercased text so they are independent of placeholder
    insertion order."""
    t = F.col(text_col)
    staged = df.select(F.col(id_col), t, F.lower(t).alias("_lt"))
    pii = pii_counts(F.col("_lt"))
    return staged.select(
        F.col(id_col),
        redact_pii(t).alias("redacted"),
        *[
            c.cast("long").alias(k.replace("pii_", "n_redacted_"))
            for k, c in pii.items()
        ],
    )


SIGNAL_NAMES = [
    "dup_line_fraction",
    "word_rep_ratio",
    "top_bigram_fraction",
    "symbol_ratio",
    "pii_emails",
    "pii_phones",
    "pii_ipv4",
]


def quality_signals_long(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Long-format (id, metric, value_r) rendering — an extensible surface:
    adding a signal adds rows, not schema."""
    wide = quality_signals(df, text_col, id_col)
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("metric"),
                    F.round(F.col(name), 6).alias("value_r"),
                )
                for name in SIGNAL_NAMES
            ]
        )
    )
    return wide.select(F.col(id_col), stack.alias("_m")).select(
        id_col, "_m.metric", "_m.value_r"
    )


# ------------------------------------------------------------- URLs/domains

URL_PAT = r"https?://[^\s<>\"']+"
# capture group 1 = registrable host (scheme and leading www. stripped)
URL_HOST_PAT = r"https?://(?:www\.)?([^\s<>\"'/:?#]+)"


def url_count(lower_text: Column) -> Column:
    """Number of http(s) URLs in the text (conservative RE2/Java-common
    pattern, same count on any engine)."""
    return F.regexp_count(lower_text, F.lit(URL_PAT))


def extract_domains(lower_text: Column) -> Column:
    """Distinct registrable hosts mentioned in the text →
    array<string> (``www.`` stripped, lowercase)."""
    return F.array_distinct(
        F.regexp_extract_all(lower_text, F.lit(URL_HOST_PAT), 1)
    )


def domain_blocklist_hit(
    lower_text: Column, blocked_domains: list[str]
) -> Column:
    """True iff any URL host (or subdomain of) a blocked domain appears.

    The blocklist rides the plan as a literal array (config-scale, like
    the QC threshold dims) — suffix match covers subdomains.  For
    million-entry blocklists use a broadcast join on the exploded domain
    column instead."""
    doms = extract_domains(lower_text)
    blocked = F.lit([d.lower() for d in blocked_domains])
    return F.exists(
        doms,
        lambda d: F.exists(
            blocked,
            lambda b: (d == b) | d.endswith(F.concat(F.lit("."), b)),
        ),
    )


def badword_hit(
    norm_text: Column, toks: Column, entries: list[str]
) -> Column:
    """True iff any blocklist ENTRY occurs as a whole word (single-word
    entries) or whole-word phrase (multi-word entries) in the
    normalized text — the C4 §2.2 bad-words page filter semantics
    (any listed word/phrase present ⇒ drop the page).

    Single words check via ``arrays_overlap`` against one literal array
    (set semantics — the OR chain never grows with list size); phrases
    check space-padded substring containment so 'ban ana' cannot match
    inside 'urban anagram'.  Config-scale lists (hundreds of entries)
    ride the plan as literals; for huge lists or SUBSTRING semantics
    use ``operators/multipattern`` (Aho-Corasick) instead."""
    words, phrases = [], []
    for e in entries:
        ne = " ".join(e.lower().split())
        if not ne:
            continue
        (phrases if " " in ne else words).append(ne)
    hit = F.lit(False)
    if words:
        hit = hit | F.arrays_overlap(toks, F.lit(sorted(set(words))))
    padded = F.concat(F.lit(" "), norm_text, F.lit(" "))
    for p in sorted(set(phrases)):
        hit = hit | padded.contains(f" {p} ")
    return hit


def domain_reputation(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain reputation sheet — the input to C4-style domain-level
    filtering (a domain whose documents are consistently spammy gets
    blocked wholesale, catching pages the per-doc rules miss):

    (domain, n_docs, avg_symbol_ratio, pii_doc_rate) where ``n_docs``
    counts documents MENTIONING the domain (distinct per doc), and
    ``pii_doc_rate`` is the fraction of those docs containing any PII.

    Plan: row-local signal extraction + domain explode, one groupBy on
    the domain string.  Feed thresholded domains into
    :func:`domain_blocklist_hit` (config-scale) or a broadcast join
    (million-entry lists)."""
    lower = F.lower(F.col(text_col))
    pii = pii_counts(lower)
    total = None
    for c in pii.values():
        total = c if total is None else total + c
    staged = df.select(
        F.col(id_col),
        extract_domains(lower).alias("_doms"),
        symbol_ratio(lower).alias("_sym"),
        (total > 0).alias("_has_pii"),
    )
    exploded = staged.select(
        F.explode("_doms").alias("domain"), "_sym", "_has_pii"
    )
    return exploded.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("_sym"), 6).alias("avg_symbol_ratio"),
        F.round(
            F.avg(F.col("_has_pii").cast("double")), 6
        ).alias("pii_doc_rate"),
    )


def compression_ratios(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """(id, n_bytes, compression_ratio): zlib-compressed size over raw
    UTF-8 size — the Gopher/RefinedWeb repetitiveness signal (highly
    repetitive or templated text compresses far below ~0.4; random or
    already-compressed junk sits near 1.0).  Empty docs ratio 1.0.

    zlib has no Column equivalent, so this is the one quality signal
    that runs as Python — Arrow-batched ``mapInPandas`` over (id, text)
    only (never the full row), row-local, no shuffle.  Deterministic:
    zlib at a fixed level is bit-stable across runs and platforms for
    our purposes (same zlib everywhere in the fleet by construction of
    the runtime image; the TEST oracle is the same interpreter's zlib).
    """
    import pandas as pd  # noqa: F401  (executor-side import context)

    out_schema = f"{id_col} long, n_bytes long, compression_ratio double"
    slim = df.select(id_col, text_col)

    def run(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = [
                (t or "").encode("utf-8") for t in pdf[text_col].tolist()
            ]
            n = [len(b) for b in raw]
            ratio = [
                (len(zlib.compress(b, level)) / nb) if nb else 1.0
                for b, nb in zip(raw, n)
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n,
                    "compression_ratio": ratio,
                }
            )

    return slim.mapInPandas(run, schema=out_schema)


# --------------------------------------------------------- intra-doc clean

def dedup_paragraphs(text: Column, sep: str = "\n\n") -> Column:
    """Remove repeated paragraphs WITHIN a document, keeping first
    occurrences in order (``array_distinct`` preserves first-seen order)
    — the intra-doc half of the dedup story (boilerplate headers,
    scraped nav blocks repeating mid-page).  Row-local, no shuffle."""
    return F.array_join(
        F.array_distinct(F.split(text, F.lit(sep), -1)), sep
    )


def dedup_lines(text: Column) -> Column:
    """Line-level variant of :func:`dedup_paragraphs` (drops repeated
    lines, keeps first occurrences and their order)."""
    return F.array_join(F.array_distinct(F.split(text, "\n", -1)), "\n")


def corpus_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantiles: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Distribution drift between two corpus snapshots, per quality
    signal: exact interpolated quantiles of every ``quality_signals``
    column on each side plus the max absolute quantile gap — the
    monitoring sheet that catches a crawler or filter regression before
    it ships ('todays symbol_ratio p90 doubled').

    One aggregation per side (k x signals scalars), a tiny join on the
    signal name — the corpora themselves never join.  Output:
    (signal, q_a array, q_b array, max_gap)."""
    probs = list(quantiles)

    def side(df: DataFrame, tag: str) -> DataFrame:
        sig = quality_signals(df, text_col, id_col)
        aggs = [
            F.percentile(F.col(s), F.lit(probs)).alias(s)
            for s in SIGNAL_NAMES
        ]
        wide = sig.agg(*aggs)
        stacked = wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("signal"),
                            F.col(s).alias(f"q_{tag}"),
                        )
                        for s in SIGNAL_NAMES
                    ]
                )
            ).alias("r")
        )
        return stacked.select("r.signal", f"r.q_{tag}")

    joined = side(a, "a").join(side(b, "b"), "signal")
    gap = F.array_max(
        F.zip_with(
            F.col("q_a"), F.col("q_b"), lambda x, y: F.abs(x - y)
        )
    )
    return joined.select(
        "signal",
        F.transform(F.col("q_a"), lambda v: F.round(v, 6)).alias("q_a"),
        F.transform(F.col("q_b"), lambda v: F.round(v, 6)).alias("q_b"),
        F.round(gap, 6).alias("max_gap"),
    )

"""Corpus report ("dataset card" numbers): one command that turns a
document corpus into the headline statistics a training-data owner
reports — volume, language mix, exact-duplication rate, PII exposure,
and signal quantiles — as a LONG (metric, value) frame ready for a
dashboard or a markdown card.

Scale design (100 TB corpus):
 - ONE staged scan computes every per-doc ingredient (lower/norm/token
   projections evaluated once per row — the ``quality_signals``
   discipline), then ONE global hash aggregation reduces it: sums,
   exact percentiles, and an exact distinct-digest count.  The digest
   distinct is the only ingredient that is not partial-agg-trivial; it
   shuffles 16-byte digests once (same shape as exact dedup — at
   extreme scale swap ``approx_count_distinct`` in, documented knob);
 - the language mix is a second aggregation over (lang) — group count
   on a low-cardinality key, map-side combined;
 - output is metadata-scale (tens of rows): the report never becomes
   the bottleneck, the scan does.

Cross-engine checked end-to-end (``tools/extra_oracles.py::
x_corpus_report``): same normalization, same md5 digests, same
``percentile``/``quantile_cont`` interpolation (parity proven by the
lm-buckets oracle).

Reference scope note: beyond-reference training-data family
(SURVEY §2b/2c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import normalize_text
from qualityassurancetool_spark.operators.quality_filters import (
    dup_line_fraction,
    pii_counts,
    symbol_ratio,
)

QUANTILES = (0.1, 0.5, 0.9)


def per_doc_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The one staged per-doc projection feeding the report agg."""
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        *([F.col("lang")] if "lang" in df.columns else []),
        t,
        F.lower(t).alias("_lt"),
        normalize_text(t).alias("_norm"),
    ).withColumn("_toks", F.split(F.col("_norm"), " "))
    n_tok = F.when(F.length("_norm") == 0, F.lit(0)).otherwise(
        F.size("_toks")
    )
    pii = pii_counts(F.col("_lt"))
    has_pii = F.lit(False)
    for c in pii.values():
        has_pii = has_pii | (c > 0)
    return staged.select(
        id_col,
        *(["lang"] if "lang" in df.columns else []),
        n_tok.cast("long").alias("n_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        symbol_ratio(F.col("_lt")).alias("symbol_ratio"),
        dup_line_fraction(t).alias("dup_line_fraction"),
        has_pii.cast("double").alias("has_pii"),
        # sentinel, not NULL: countDistinct SKIPS nulls, so null-text
        # docs would all read as duplicates of nothing (review finding;
        # same convention as plans/incremental's digest diff)
        F.coalesce(
            F.md5(F.col("_norm")), F.lit("__null_text__")
        ).alias("digest"),
    )


def corpus_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """LONG report frame ``(metric string, value double)``, metrics
    sorted by name for stable presentation."""
    sig = per_doc_signals(df, text_col, id_col)
    qs = F.lit(list(QUANTILES))
    g = sig.agg(
        F.count(F.lit(1)).cast("double").alias("docs"),
        F.sum("n_tokens").cast("double").alias("total_tokens"),
        F.sum("n_chars").cast("double").alias("total_chars"),
        F.avg("n_tokens").alias("avg_tokens_per_doc"),
        F.countDistinct("digest").cast("double").alias("n_distinct"),
        F.avg("has_pii").alias("pii_doc_rate"),
        F.percentile("symbol_ratio", qs).alias("q_sym"),
        F.percentile("dup_line_fraction", qs).alias("q_dup"),
        F.percentile(F.col("n_tokens").cast("double"), qs).alias("q_tok"),
    )
    rows = []
    for m in (
        "docs",
        "total_tokens",
        "total_chars",
        "avg_tokens_per_doc",
        "pii_doc_rate",
    ):
        rows.append(F.struct(F.lit(m).alias("metric"), F.col(m).alias("value")))
    rows.append(
        F.struct(
            F.lit("exact_dup_rate").alias("metric"),
            (F.lit(1.0) - F.col("n_distinct") / F.col("docs")).alias("value"),
        )
    )
    for name, col in (("symbol_ratio", "q_sym"), ("dup_line_fraction", "q_dup"),
                      ("n_tokens", "q_tok")):
        for i, q in enumerate(QUANTILES):
            rows.append(
                F.struct(
                    F.lit(f"{name}_p{int(q * 100)}").alias("metric"),
                    F.element_at(F.col(col), i + 1).alias("value"),
                )
            )
    scalar = g.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.metric", "r.value"
    )
    if "lang" in df.columns:
        # shares via a broadcast crossJoin with the one-row global agg —
        # no extra driver action, the whole report stays ONE lazy plan
        langs = (
            sig.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .crossJoin(F.broadcast(g.select("docs")))
            .select(
                F.concat(F.lit("lang_share:"), F.col("lang")).alias("metric"),
                (F.col("n") / F.col("docs")).alias("value"),
            )
        )
        scalar = scalar.unionByName(langs)
    return scalar.orderBy("metric")


def report_markdown(report: DataFrame) -> str:
    """Render the report frame as a small markdown card (driver-side;
    the frame is metadata-scale by construction)."""
    lines = ["| metric | value |", "|---|---|"]
    for r in report.collect():
        v = r["value"]
        # null-valued metrics (percentiles over an empty corpus) render
        # as n/a instead of crashing the report
        lines.append(
            f"| {r['metric']} | {'n/a' if v is None else format(v, '.6g')} |"
        )
    return "\n".join(lines)


def value_histogram(
    df,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    group_col: str | None = None,
):
    """Fixed-width histogram of a numeric column — the dataset-card
    companion to :func:`corpus_report`'s scalar signals (length/score
    distributions, drift eyeballing).  Explicit [lo, hi) range (no
    min/max pre-pass, stable across snapshots); underflow clamps to
    bin 0, overflow to bin n_bins-1, nulls are dropped and reported by
    the caller's row counts.  One partial-agged groupBy on the bin id
    (× ``group_col`` when given) — ~n_bins rows out regardless of
    corpus size.  Cross-engine: ``x_histogram``."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    raw = F.floor(
        (F.col(value_col) - F.lit(lo)) / F.lit(hi - lo) * F.lit(n_bins)
    )
    bin_id = F.greatest(
        F.lit(0), F.least(F.lit(n_bins - 1), raw)
    ).cast("int")
    keys = ([F.col(group_col)] if group_col else []) + [
        bin_id.alias("bin_id")
    ]
    v = F.col(value_col).cast("double")
    out = (
        # NaN passes isNotNull and would clamp into an edge bin,
        # silently inflating the under/overflow counts the docstring
        # presents as meaningful (review finding)
        df.where(v.isNotNull() & ~F.isnan(v))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    width = (hi - lo) / n_bins
    return out.select(
        *([group_col] if group_col else []),
        "bin_id",
        (F.lit(lo) + F.col("bin_id") * F.lit(width)).alias("bin_lo"),
        (F.lit(lo) + (F.col("bin_id") + 1) * F.lit(width)).alias("bin_hi"),
        "n",
    )

"""Deterministic span corruption — T5-style denoising targets
(Raffel et al. 2020, "Exploring the Limits of Transfer Learning...",
the `span_corruption` objective): mask random token spans, replace
each with a sentinel, and emit (inputs, targets) where targets list
each sentinel followed by the tokens it hid.

Everything is a pure-Column row-local computation, and — like every
sampler in this engine — "random" means md5-derived from
(salt, doc_id, position): re-runs, task retries, and the Python oracle
produce byte-identical corruptions.  No rand(), no seed plumbing, no
per-epoch state; a different ``salt`` gives an independent corruption
of the same corpus (the per-epoch remix).

Span model: a span may START at any non-covered position with
probability ``p_start`` (u1 < p_start); its length is uniform in
[1, 2*mean_span_len - 1] (mean = mean_span_len, like T5's mean-3
spans); spans cannot touch (>= 1 gap) so sentinels never collide.
The expected mask rate is ~p_start * mean / (1 + p_start * (mean+1)),
tune ``p_start`` for the usual 15%.

Scale: one fold over the token positions per row (O(n + spans)), one
transform to rebuild inputs/targets.  No shuffle, no Python stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import (
    md5_long,
    normalize_text,
)

_DENOM = float(2**60)


def _u(salt: str, id_col: Column, i: Column) -> Column:
    """Deterministic uniform [0,1) from (salt, id, position)."""
    return (
        md5_long(
            F.concat(
                F.lit(salt), id_col.cast("string"), F.lit(":"),
                i.cast("string"),
            )
        )
        / F.lit(_DENOM)
    )


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    p_start: float = 0.06,
    mean_span_len: int = 3,
    salt: str = "t5:",
) -> DataFrame:
    """(id, inputs, targets, n_spans, n_masked_tokens).

    ``inputs`` is the document with each masked span replaced by
    ``<extra_id_K>``; ``targets`` is ``<extra_id_0> span0 tokens
    <extra_id_1> span1 tokens ...`` — the T5 denoising pair.  Documents
    with no tokens (or no selected spans) pass through with empty
    targets.
    """
    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
    )

    max_len = 2 * mean_span_len - 1
    # Generate barriers (see fingerprint.py note): keep _norm/_t as
    # attributes so CollapseProject cannot inline the regexp/split into
    # the per-position fold and rebuild lambdas
    normed = compute_behind_barrier(
        df.select(F.col(id_col), F.col(text_col)),
        {"_norm": normalize_text(F.col(text_col))},
    )
    staged = compute_behind_barrier(
        normed.select(id_col, "_norm"),
        {
            "_t": F.when(
                F.length("_norm") == 0, F.array().cast("array<string>")
            ).otherwise(F.split(F.col("_norm"), " "))
        },
    ).select(id_col, "_t")
    toks = F.col("_t")
    n = F.size(toks)
    did = F.col(id_col)

    # fold over positions: acc = (nxt allowed start, spans[(s,e,k)])
    empty_spans = F.array().cast("array<struct<s:int,e:int,k:int>>")
    init = F.struct(
        F.lit(1).alias("nxt"), empty_spans.alias("spans")
    )

    def step(acc: Column, i: Column) -> Column:
        u1 = _u(salt + "s:", did, i)
        ln = (
            F.pmod(
                md5_long(
                    F.concat(
                        F.lit(salt + "l:"), did.cast("string"),
                        F.lit(":"), i.cast("string"),
                    )
                ),
                F.lit(max_len),
            )
            + 1
        ).cast("int")
        e = F.least(i + ln - 1, n).cast("int")
        starts = (i >= acc["nxt"]) & (u1 < F.lit(p_start))
        new_span = F.struct(
            i.cast("int").alias("s"),
            e.alias("e"),
            F.size(acc["spans"]).alias("k"),
        )
        return F.when(
            starts,
            F.struct(
                (e + 2).alias("nxt"),
                F.concat(acc["spans"], F.array(new_span)).alias("spans"),
            ),
        ).otherwise(acc)

    folded = compute_behind_barrier(
        staged,
        {
            "_spans": F.aggregate(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))), init, step
            )["spans"]
        },
    ).select(id_col, "_t", "_spans")
    spans = F.col("_spans")
    toks = F.col("_t")
    n = F.size(toks)

    # inputs: per position emit token / sentinel-at-span-start / nothing
    def piece(i: Column) -> Column:
        hit = F.filter(spans, lambda v: (i >= v["s"]) & (i <= v["e"]))
        inside = F.size(hit) > 0
        at_start = inside & (i == F.element_at(hit, 1)["s"])
        sent = F.concat(
            F.lit("<extra_id_"),
            F.element_at(hit, 1)["k"].cast("string"),
            F.lit(">"),
        )
        return F.when(at_start, sent).when(inside, F.lit(None)).otherwise(
            F.element_at(toks, i)
        )

    pieces = F.filter(
        F.transform(F.sequence(F.lit(1), F.greatest(n, F.lit(1))), piece),
        lambda x: x.isNotNull(),
    )
    inputs = F.when(n > 0, F.concat_ws(" ", pieces)).otherwise(F.lit(""))

    tgt_parts = F.transform(
        spans,
        lambda v: F.concat(
            F.lit("<extra_id_"), v["k"].cast("string"), F.lit("> "),
            F.concat_ws(
                " ", F.slice(toks, v["s"], v["e"] - v["s"] + 1)
            ),
        ),
    )
    targets = F.concat_ws(" ", tgt_parts)
    n_masked = F.aggregate(
        spans, F.lit(0), lambda a, v: a + (v["e"] - v["s"] + 1)
    )
    return folded.select(
        id_col,
        inputs.alias("inputs"),
        targets.alias("targets"),
        F.size(spans).cast("long").alias("n_spans"),
        n_masked.cast("long").alias("n_masked_tokens"),
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fim_rate: float = 0.5,
    salt: str = "fim:",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"):
    with probability ``fim_rate`` a document is split at two
    md5-deterministic token cut points into (prefix, middle, suffix)
    and re-rendered in PSM order with sentinels —
    ``<fim_prefix> P <fim_suffix> S <fim_middle> M`` — else passed
    through unchanged.  (id, fim_text, is_fim).

    Cut points: u1, u2 uniform over token boundaries 0..n (derived from
    (salt, id, 1|2)); lo = min, hi = max.  Degenerate docs (< 2 tokens)
    pass through.  Row-local pure Columns; per-epoch remix via salt.
    """
    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
    )

    normed = compute_behind_barrier(
        df.select(F.col(id_col), F.col(text_col)),
        {"_norm": normalize_text(F.col(text_col))},
    )
    staged = compute_behind_barrier(
        normed.select(id_col, "_norm"),
        {
            "_t": F.when(
                F.length("_norm") == 0, F.array().cast("array<string>")
            ).otherwise(F.split(F.col("_norm"), " "))
        },
    ).select(id_col, "_norm", "_t")
    did, toks = F.col(id_col), F.col("_t")
    n = F.size(toks)
    pick = _u(salt + "r:", did, F.lit(0)) < F.lit(fim_rate)
    c1 = F.pmod(
        md5_long(F.concat(F.lit(salt + "c1:"), did.cast("string"))), n + 1
    ).cast("int")
    c2 = F.pmod(
        md5_long(F.concat(F.lit(salt + "c2:"), did.cast("string"))), n + 1
    ).cast("int")
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    fim = F.concat(
        F.lit("<fim_prefix> "),
        F.concat_ws(" ", F.slice(toks, 1, lo)),
        F.lit(" <fim_suffix> "),
        F.concat_ws(
            " ", F.when(hi < n, F.slice(toks, hi + 1, n - hi)).otherwise(
                F.array().cast("array<string>")
            )
        ),
        F.lit(" <fim_middle> "),
        F.concat_ws(
            " ",
            F.when(hi > lo, F.slice(toks, lo + 1, hi - lo)).otherwise(
                F.array().cast("array<string>")
            ),
        ),
    )
    use_fim = pick & (n >= 2)
    return staged.select(
        id_col,
        F.when(use_fim, fim).otherwise(F.col("_norm")).alias("fim_text"),
        use_fim.alias("is_fim"),
    )

"""Exact heavy hitters over unbounded key cardinality in two passes.

``top_kgrams`` (ngram_stats) relies on Spark's partial aggregation: each
task's hash map holds every distinct key seen in its partition.  That is
the right default, but at 100 TB with billions of distinct tokens/URLs
the per-task map spills and the shuffle carries one record per distinct
(key, partition) pair.  The classic fix (Misra & Gries 1982; mergeable
form: Agarwal et al., "Mergeable Summaries", PODS 2012) bounds state:

 - **Pass 1 (candidates)**: every partition maintains a Misra–Gries
   summary of at most ``capacity`` counters — built per Arrow batch with
   a C-speed ``value_counts`` (an exact, hence error-free, MG summary of
   the batch) and merged into the running summary by pointwise addition
   followed by the MG prune (subtract the (capacity+1)-th largest count,
   drop non-positive).  Merged deficit per key ≤ n_p/(capacity+1), so
   any key with partition share > 1/(capacity+1) survives.  By
   averaging, a key with GLOBAL share ≥ ``min_fraction`` has at least
   that share in some partition, so with
   ``capacity = ceil(1/min_fraction)`` the union of partition summaries
   is a guaranteed superset of the true heavy hitters.  At most
   ``n_partitions × capacity`` candidate keys leave pass 1.
 - **Pass 2 (exact)**: broadcast-semi-join the corpus against the
   candidate set and count exactly.  The partial-agg maps now track only
   candidate keys, so memory and shuffle are bounded by
   ``n_partitions × capacity`` regardless of corpus cardinality, and the
   final share filter makes the output EXACT.  The threshold convention:
   ``min_fraction`` is interpreted as the nearest rational with
   denominator ≤ 1e12 (so decimal inputs like 0.07 mean exactly 7/100)
   and the filter is integer ``n*den >= total*num`` — no float-rounding
   exclusions at the boundary.  Fully checkable by a plain SQL GROUP
   BY/HAVING oracle (``tools/extra_oracles.py::x_heavy_hitters``, whose
   DuckDB decimal literal arithmetic is likewise exact).

Reference scope note: beyond-reference training-data family (SURVEY
§2b/2c) — corpus-frequency audits (stopword/boilerplate discovery,
domain concentration) at cardinalities where one-pass groupBy state is
the bottleneck.
"""

from __future__ import annotations

import math
from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    StructField,
    StructType,
)

from qualityassurancetool_spark.functions.hashing import tokens
from qualityassurancetool_spark.functions.partitioning import (
    compute_behind_barrier,
)


def mg_merge(counts: dict, vc, capacity: int) -> dict:
    """THE Misra–Gries merge-prune — pointwise add a batch's exact
    counts (a ``value_counts`` Series), then subtract the
    (capacity+1)-th largest and drop non-positive (at most
    ``capacity`` keys can strictly exceed it).  Shared by the batch
    kernel and the streaming state update
    (``streaming/heavy_hitters``) so the two can never drift."""
    import heapq

    for k, c in vc.items():
        counts[k] = counts.get(k, 0) + int(c)
    if len(counts) > capacity:
        cut = heapq.nlargest(capacity + 1, counts.values())[-1]
        counts = {k: c - cut for k, c in counts.items() if c > cut}
    return counts


def _non_null_keys(df: DataFrame, key_col: str) -> DataFrame:
    """Null AND NaN keys removed — pandas ``value_counts`` silently
    drops NaN, so a NaN key could never become a candidate while still
    counting toward the total, breaking the exactness guarantee; both
    passes must agree on the excluded set."""
    keyed = df.select(F.col(key_col)).where(F.col(key_col).isNotNull())
    if isinstance(
        keyed.schema[key_col].dataType, (DoubleType, FloatType)
    ):
        keyed = keyed.where(~F.isnan(F.col(key_col)))
    return keyed


def mg_candidates(
    df: DataFrame, key_col: str, capacity: int
) -> DataFrame:
    """Distinct candidate keys from per-partition Misra–Gries summaries
    of at most ``capacity`` counters (see module docstring for the
    superset guarantee).  Null/NaN keys are ignored — never meaningful
    heavy hitters, and excluded consistently from both passes."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    keyed = _non_null_keys(df, key_col)
    out_schema = StructType(
        [StructField(key_col, keyed.schema[key_col].dataType)]
    )

    def kernel(batches):
        counts: dict = {}
        for pdf in batches:
            counts = mg_merge(
                counts, pdf[key_col].value_counts(), capacity
            )
        if counts:
            import pandas as pd

            yield pd.DataFrame({key_col: list(counts.keys())})

    return keyed.mapInPandas(kernel, out_schema).distinct()


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_fraction: float,
    capacity: int | None = None,
) -> DataFrame:
    """Exact ``(key_col, n)`` for every non-null key whose occurrence
    count is ≥ ``min_fraction`` of all non-null rows.

    ``capacity`` defaults to ``ceil(1/min_fraction)`` — the smallest
    summary for which the candidate pass is a guaranteed superset.
    Larger capacities trade pass-1 memory for fewer false candidates in
    pass 2; smaller ones (explicitly passed) break the exactness
    guarantee and are rejected.
    """
    if not (0.0 < min_fraction <= 1.0):
        raise ValueError(f"min_fraction must be in (0, 1], got {min_fraction}")
    floor_cap = math.ceil(1.0 / min_fraction)
    if capacity is None:
        capacity = floor_cap
    elif capacity < floor_cap:
        raise ValueError(
            f"capacity {capacity} < ceil(1/min_fraction) = {floor_cap}: "
            "the candidate pass would not be a superset"
        )
    keyed = _non_null_keys(df, key_col)
    cand = mg_candidates(df, key_col, capacity)
    # ONE exact pass for counts AND total: non-candidate keys fold into
    # a single NULL bucket cell, so the total is the window sum over
    # the ≤ |candidates|+1 cells — the previous separate
    # `keyed.agg(count)` total re-ran the full input scan (3 passes
    # where 2 suffice; guide §2.4).  Candidate keys are distinct, so
    # the left join marks without multiplying rows.
    marked = keyed.join(
        F.broadcast(cand.withColumn("_cand", F.lit(1))),
        key_col,
        "left",
    )
    counts = marked.groupBy(
        F.when(F.col("_cand") == 1, F.col(key_col)).alias(key_col)
    ).agg(F.count(F.lit(1)).alias("n"))
    # Exactness at the boundary: ``n >= total * min_fraction`` in
    # floating point can exclude a key sitting EXACTLY at the
    # documented share (total=100, min_fraction=0.07 → 7.0000000000000001).
    # Interpret min_fraction as the nearest rational with denominator
    # ≤ 1e12 (decimal inputs like 0.07 → exactly 7/100) and compare in
    # integer arithmetic, widened to decimal so neither side can
    # overflow (n ≤ ~1e18 × den ≤ 1e12 < the decimal(38) ceiling).
    frac = Fraction(float(min_fraction)).limit_denominator(10**12)
    if frac.numerator == 0:
        # below rational resolution the filter would silently become
        # n >= 0 (review finding); such fractions are also unusable
        # upstream (capacity = ceil(1/f) counters per partition)
        raise ValueError(
            f"min_fraction={min_fraction!r} is below 1e-12 resolution"
        )
    return (
        counts.select(
            key_col,
            "n",
            F.sum("n").over(Window.partitionBy()).alias("_total"),
        )
        .where(F.col(key_col).isNotNull())
        .where(
            F.col("n").cast("decimal(38,0)") * F.lit(frac.denominator)
            >= F.col("_total").cast("decimal(38,0)") * F.lit(frac.numerator)
        )
        .select(key_col, "n")
    )


def _non_null_keys_by(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """Grouped twin of :func:`_non_null_keys` (same NaN discipline).
    Null-GROUP rows are excluded too: the exact pass equi-joins on the
    group columns, where SQL null never matches — keeping them in the
    totals but never in the candidates would silently break the
    exactness guarantee for the null stratum."""
    keyed = df.select(*group_cols, F.col(key_col)).where(
        F.col(key_col).isNotNull()
    )
    for c in group_cols:
        keyed = keyed.where(F.col(c).isNotNull())
    if isinstance(
        keyed.schema[key_col].dataType, (DoubleType, FloatType)
    ):
        keyed = keyed.where(~F.isnan(F.col(key_col)))
    return keyed


def heavy_hitters_by(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    min_fraction: float,
    capacity: int | None = None,
) -> DataFrame:
    """Per-GROUP exact heavy hitters: group cols + ``(key_col, n)``
    for every key whose count is ≥ ``min_fraction`` of its group's
    non-null rows — top tokens per lang, hot URLs per domain, the
    per-stratum audit shape.

    Same two-pass Misra–Gries scheme as :func:`heavy_hitters`, with
    the summary kept PER (partition, group): a key with share ≥ f of
    its group has share ≥ f of that group's rows in at least one
    partition, so capacity ⌈1/f⌉ per (partition, group) keeps the
    candidate union a guaranteed superset — state is
    ``groups × capacity`` counters per task, candidates ≤
    ``partitions × groups × capacity`` rows, and the exact pass is
    bounded the same way regardless of key cardinality.  The share
    threshold uses the same integer-rational comparison (no
    float-boundary exclusions), per group."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use heavy_hitters")
    if not (0.0 < min_fraction <= 1.0):
        raise ValueError(
            f"min_fraction must be in (0, 1], got {min_fraction}"
        )
    floor_cap = math.ceil(1.0 / min_fraction)
    if capacity is None:
        capacity = floor_cap
    elif capacity < floor_cap:
        raise ValueError(
            f"capacity {capacity} < ceil(1/min_fraction) = {floor_cap}: "
            "the candidate pass would not be a superset"
        )
    keyed = _non_null_keys_by(df, group_cols, key_col)
    schema = StructType(
        [StructField(c, keyed.schema[c].dataType) for c in group_cols]
        + [StructField(key_col, keyed.schema[key_col].dataType)]
    )
    gcols, cap = list(group_cols), capacity

    def kernel(batches):
        summaries: dict = {}  # group tuple -> MG counter dict
        for pdf in batches:
            for gval, sub in pdf.groupby(gcols, dropna=False, sort=False):
                gkey = gval if isinstance(gval, tuple) else (gval,)
                summaries[gkey] = mg_merge(
                    summaries.get(gkey, {}),
                    sub[key_col].value_counts(),
                    cap,
                )
        if summaries:
            import pandas as pd

            rows = [
                g + (k,)
                for g, counts in summaries.items()
                for k in counts
            ]
            yield pd.DataFrame(rows, columns=gcols + [key_col])

    cand = keyed.mapInPandas(kernel, schema).distinct()
    # counts AND group totals in ONE exact pass (see heavy_hitters):
    # non-candidate keys fold into a per-group NULL bucket; the group
    # total is a window sum over that group's ≤ capacity·partitions+1
    # cells, so the separate full-scan totals pass disappears.
    marked = keyed.join(
        F.broadcast(cand.withColumn("_cand", F.lit(1))),
        gcols + [key_col],
        "left",
    )
    counts = marked.groupBy(
        *gcols,
        F.when(F.col("_cand") == 1, F.col(key_col)).alias(key_col),
    ).agg(F.count(F.lit(1)).alias("n"))
    frac = Fraction(float(min_fraction)).limit_denominator(10**12)
    if frac.numerator == 0:
        raise ValueError(
            f"min_fraction={min_fraction!r} is below 1e-12 resolution"
        )
    return (
        counts.select(
            *gcols,
            key_col,
            "n",
            F.sum("n").over(Window.partitionBy(*gcols)).alias("_total"),
        )
        .where(F.col(key_col).isNotNull())
        .where(
            F.col("n").cast("decimal(38,0)") * F.lit(frac.denominator)
            >= F.col("_total").cast("decimal(38,0)")
            * F.lit(frac.numerator)
        )
        .select(*gcols, key_col, "n")
    )


def token_heavy_hitters(
    df: DataFrame,
    min_fraction: float = 0.002,
    text_col: str = "text",
    capacity: int | None = None,
) -> DataFrame:
    """Corpus-wide heavy-hitter TOKENS: ``(token, n)`` for tokens whose
    occurrence share of the whole token stream is ≥ ``min_fraction``.
    Tokenization is the corpus-standard normalize → whitespace split
    (``functions.hashing.tokens``), so counts line up with
    vocab/decontam/ngram numbers.  Occurrence counts, not document
    frequency — the complementary audit to ``top_kgrams``."""
    toked = compute_behind_barrier(
        df.select(F.col(text_col)), {"_tok": tokens(F.col(text_col))}
    )
    stream = toked.select(F.explode("_tok").alias("token")).where(
        F.length("token") > 0
    )
    return heavy_hitters(stream, "token", min_fraction, capacity)

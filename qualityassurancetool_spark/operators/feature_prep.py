"""ML feature preparation — target encoding and chi-squared
association, the tabular-feature side of in-engine model prep
(the numeric features that ``operators/logreg`` then fits).

``target_encode``: replace a high-cardinality categorical with the
smoothed per-category label mean — the classic CTR/tabular encoding.
Additive smoothing pulls rare categories toward the global prior
(``enc = (Σy + m·prior) / (n + m)``); the leave-one-out variant
excludes the row's OWN label from its encoding, the standard
leakage guard when encoding the training split itself.

``chi_squared``: per-feature chi² association with a categorical
label from the contingency table — the cheap filter-method feature
ranking.  Each feature's table is categories × labels (tiny); the
scan computes all features' tables in one pass via explode.

Scale shape: target encoding is one groupBy on the category key
plus a same-key join back (co-partitioned — Catalyst reuses the
exchange), or for LOO a window over the category key (single
shuffle).  Chi² explodes each row into |features| (feature, value,
label) triples — shuffle carries (feature, value, label) keys only,
counts partial-aggregate map-side, and the final statistic is
computed over contingency-sized frames.

Cross-engine: ``tools/extra_oracles.py::x_feature_prep`` — DuckDB
window/contingency replica.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    smoothing: float = 0.0,
    loo: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` (default ``{cat_col}_te``) with the smoothed
    per-category mean of ``label_col``.

    NULL categories form their own stratum (encoded like any other);
    NULL labels are excluded from the statistics but still receive
    an encoding.  With ``loo=True``, each non-null-label row's own
    label is excluded from its encoding; a category's only labeled
    row falls back to the smoothed prior (or NULL when
    ``smoothing == 0`` — no information left).
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    out = out_col or f"{cat_col}_te"
    y = F.col(label_col).cast("double")
    m = F.lit(float(smoothing))
    # global prior as a scalar aggregate broadcast back — an
    # empty-frame Window.partitionBy() would funnel the WHOLE
    # dataset through one 'Exchange SinglePartition' task (the
    # cuped_adjust/rfm pattern instead: 2-double frame, zero-cost
    # BroadcastNestedLoopJoin)
    pstats = df.agg(
        F.sum(y).alias("__te_psum"), F.count(y).alias("__te_pcnt")
    )
    prior = F.col("__te_psum") / F.col("__te_pcnt")
    w_cat = Window.partitionBy(cat_col)
    s = F.sum(y).over(w_cat)
    n = F.count(y).over(w_cat)
    if loo:
        s_i = F.when(y.isNotNull(), s - y).otherwise(s)
        n_i = F.when(y.isNotNull(), n - 1).otherwise(n)
    else:
        s_i, n_i = s, n
    enc = F.when(
        n_i + m > 0, (s_i + m * prior) / (n_i + m)
    )
    return (
        df.crossJoin(F.broadcast(pstats))
        .withColumn(out, enc)
        .drop("__te_psum", "__te_pcnt")
    )


def chi_squared(
    df: DataFrame,
    cat_cols: list[str],
    label_col: str,
) -> DataFrame:
    """``(feature, chi2, dof, n)`` per categorical feature:
    chi² = Σ_cells (obs − n·p_row·p_col)² / (n·p_row·p_col) over the
    feature × label contingency table; ``dof = (|cats|−1)(|labels|−1)``.
    Rows with NULL label are ignored; NULL category values form
    their own stratum.  Higher chi² = stronger association.
    """
    if not cat_cols:
        raise ValueError("cat_cols must be non-empty")
    if len(set(cat_cols)) != len(cat_cols):
        raise ValueError(f"features must be distinct, got {cat_cols}")
    triples = df.where(F.col(label_col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.coalesce(
                            F.col(c).cast("string"), F.lit("__null__")
                        ).alias("v"),
                    )
                    for c in cat_cols
                ]
            )
        ).alias("_f"),
        F.col(label_col).cast("string").alias("_y"),
    )
    cells = triples.groupBy(
        F.col("_f.feature").alias("feature"),
        F.col("_f.v").alias("v"),
        "_y",
    ).agg(F.count(F.lit(1)).alias("obs"))
    wf = Window.partitionBy("feature")
    wv = Window.partitionBy("feature", "v")
    wy = Window.partitionBy("feature", "_y")
    n = F.sum("obs").over(wf)
    row_tot = F.sum("obs").over(wv)
    col_tot = F.sum("obs").over(wy)
    exp = row_tot * col_tot / n
    # zero-observation cells contribute (0-exp)²/exp = exp; add the
    # missing mass: chi2 = Σ_present term + Σ_absent exp, and
    # Σ_all exp = n, so Σ_absent exp = n − Σ_present exp.  Track the
    # present-cell expected mass alongside the terms.
    present = cells.select(
        "feature",
        "v",
        "_y",
        n.alias("_n"),
        exp.alias("_exp"),
        ((F.col("obs") - exp) * (F.col("obs") - exp) / exp).alias(
            "_term"
        ),
    )
    agg = present.groupBy("feature").agg(
        F.first("_n").alias("n"),
        F.sum("_term").alias("_t"),
        F.sum("_exp").alias("_e"),
        F.countDistinct("v").alias("_nv"),
        F.countDistinct("_y").alias("_ny"),
    )
    return agg.select(
        "feature",
        F.round(
            F.col("_t") + (F.col("n") - F.col("_e")), 10
        ).alias("chi2"),
        ((F.col("_nv") - 1) * (F.col("_ny") - 1))
        .cast("long")
        .alias("dof"),
        F.col("n").cast("long").alias("n"),
    )


def quantile_bin(
    df: DataFrame,
    col: str,
    n_bins: int,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
    approx: bool = False,
    round_digits: int = 6,
) -> DataFrame:
    """Equal-frequency discretization: add ``out_col`` (default
    ``{col}_bin``) with the 0-based quantile bin of ``col`` —
    per group when ``group_cols`` is given.

    The interior cut-points ``q_{1/k} … q_{(k-1)/k}`` are computed
    exactly (``percentile``, type-7 linear interpolation — the
    ``quantile_cont`` definition) or, with ``approx=True``, via
    ``percentile_approx`` (a partial-aggregatable sketch — the
    100 TB path, where the exact aggregate would buffer each
    group's values).  Cut-points are rounded to ``round_digits``
    BEFORE binning so bin assignment is reproducible across engines
    and runs (a raw interpolated cut-point is an FP artifact; rows
    sitting exactly on one would otherwise flip bins between
    engines).  Bin = count of cut-points strictly below the value
    (a JVM higher-order fold over the broadcast cut-point array, no
    UDF); duplicate cut-points from skewed data collapse naturally
    (some bins stay empty).  NULL values get a NULL bin.

    Spark shape: one aggregate produces a GROUPS-sized cut-point
    frame (driver-scale metadata), broadcast-joined back onto the
    rows — the data itself is never shuffled.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    g = group_cols or []
    out = out_col or f"{col}_bin"
    x = F.col(col).cast("double")
    probs = [i / n_bins for i in range(1, n_bins)]
    parr = F.array(*[F.lit(p) for p in probs])
    cuts = (
        F.percentile_approx(x, parr, 10_000)
        if approx
        else F.percentile(x, parr)
    )
    cut_frame = df.groupBy(*g).agg(
        F.transform(
            cuts, lambda c: F.round(c, round_digits)
        ).alias("_cuts")
    )
    from pyspark.sql.functions import broadcast

    if g:
        # null-safe join keys: a NULL group is its own stratum (the
        # same discipline as target_encode / heavy_hitters) — a
        # plain equi-join would leave every null-group row with a
        # NULL bin even for non-null values
        from qualityassurancetool_spark.functions.partitioning import (
            broadcast_join_nullsafe,
        )

        joined = broadcast_join_nullsafe(df, cut_frame, g)
    else:
        joined = df.crossJoin(broadcast(cut_frame))
    bin_ = F.aggregate(
        F.col("_cuts"),
        F.lit(0),
        lambda acc, c: acc
        + F.when(x > c, F.lit(1)).otherwise(F.lit(0)),
    )
    return joined.withColumn(
        out, F.when(x.isNotNull(), bin_).cast("int")
    ).drop("_cuts")

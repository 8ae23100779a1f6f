"""CUSUM control charts — the sequential-recurrence chart that DOES
distribute.

Page's cumulative-sum chart (Page 1954; NIST/SEMATECH e-handbook
§6.3.2.3) accumulates small persistent shifts that per-point charts
(range, z-score, EWMA) miss:

    s⁺_t = max(0, s⁺_{t−1} + (x_t − target − slack))
    s⁻_t = max(0, s⁻_{t−1} + (target − slack − x_t))

and signals when either statistic crosses the decision threshold
``h``.  The recurrence looks as sequential as EWMA's — but unlike
EWMA it has an exact closed form over prefix sums (the classic
max-plus identity, same family as the maximum-subarray trick):

    with y_i = x_i − target − slack and S_t = Σ_{i≤t} y_i:
        s⁺_t = S_t − min(0, min_{j≤t} S_j)

so the whole chart is TWO stacked window expressions — a running sum,
then a running min over it — per direction.  One shuffle on the group
key, no UDF, no iteration, exactly replicable in any SQL engine
(``tools/extra_oracles.py::x_cusum`` replays it in DuckDB and a pytest
pins it against the literal recurrence).

``target``/``sigma`` defaults are per-group scalars estimated from
the batch itself (mean / stddev via one aggregate, broadcast back —
the ``target_encode`` prior pattern, never an empty-frame window); in
production you pass the in-control values from history instead (the
estimate-from-data mode double-dips the shift into the baseline, the
standard caveat).

NULL discipline: a NULL value carries the state through unchanged
(sum ignores NULLs) and gets a NULL flag — unknown, not clean.

Reference anchor: the reference's QC checks are per-point
(`src/main.py` range/z-score family); CUSUM is the standard drift
companion, kept Spark-first per SURVEY §7.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cusum_anomaly(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    group_cols: list[str] | None = None,
    target: float | None = None,
    sigma: float | None = None,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Add ``cusum_pos``, ``cusum_neg`` (the two one-sided statistics,
    in σ units) and ``cusum_flag`` (either statistic > ``threshold``).

    ``slack`` and ``threshold`` are in σ units (the classic k=0.5σ,
    h=5σ tuning detects ~1σ shifts fastest).  ``target``/``sigma``:
    in-control mean and deviation; when None they are estimated per
    group from this batch (one scalar aggregate, broadcast back).
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if slack < 0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    g = group_cols or []
    x = F.col(value_col).cast("double")

    if target is None or sigma is None:
        stats = df.groupBy(*g).agg(
            F.avg(x).alias("__cu_mu"),
            F.stddev_samp(x).alias("__cu_sd"),
        )
        if g:
            cond = F.lit(True)
            st = stats.select(
                *[F.col(c).alias(f"__cu_{c}") for c in g],
                "__cu_mu",
                "__cu_sd",
            )
            for c in g:
                cond = cond & F.col(c).eqNullSafe(F.col(f"__cu_{c}"))
            base = df.join(F.broadcast(st), on=cond, how="left").drop(
                *[f"__cu_{c}" for c in g]
            )
        else:
            base = df.crossJoin(F.broadcast(stats))
        mu = (
            F.lit(float(target))
            if target is not None
            else F.col("__cu_mu")
        )
        sd = (
            F.lit(float(sigma))
            if sigma is not None
            else F.col("__cu_sd")
        )
    else:
        base = df
        mu, sd = F.lit(float(target)), F.lit(float(sigma))

    # standardized deviations; σ=0 (constant in-control stream) makes
    # every nonzero deviation infinite — guard to NULL (no chart)
    z = F.when(sd > 0, (x - mu) / sd)
    y_pos = z - F.lit(float(slack))
    y_neg = -z - F.lit(float(slack))

    w_cum = (
        Window.partitionBy(*g)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # stage the prefix sums, then the running min over them (window
    # functions cannot nest) — same partitioning, Catalyst reuses the
    # exchange and sort
    staged = base.select(
        "*",
        F.sum(y_pos).over(w_cum).alias("__cu_sp"),
        F.sum(y_neg).over(w_cum).alias("__cu_sn"),
    )
    s_pos = F.col("__cu_sp") - F.least(
        F.lit(0.0), F.min("__cu_sp").over(w_cum)
    )
    s_neg = F.col("__cu_sn") - F.least(
        F.lit(0.0), F.min("__cu_sn").over(w_cum)
    )
    # a NULL value carries state: its own row shows the carried
    # statistic (sum ignored the NULL) but flags NULL
    flag = F.when(
        x.isNotNull() & s_pos.isNotNull() & s_neg.isNotNull(),
        (s_pos > threshold) | (s_neg > threshold),
    )
    drop = ["__cu_sp", "__cu_sn"] + (
        ["__cu_mu", "__cu_sd"] if target is None or sigma is None else []
    )
    return (
        staged.withColumn("cusum_pos", s_pos)
        .withColumn("cusum_neg", s_neg)
        .withColumn("cusum_flag", flag)
        .drop(*drop)
    )

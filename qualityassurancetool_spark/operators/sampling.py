"""Deterministic sampling for training-data pipelines: stratified
fraction sampling and per-stratum deterministic top-k, with no ``rand()``
anywhere — every decision is a pure function of (salt, id), so re-runs,
task retries, and any SQL engine reproduce the exact same sample (the
property that makes a 100 TB sampling job idempotent and auditable).

The uniform variate is md5-derived: the first 15 hex digits of
``md5(salt || id)`` as an integer, divided by 16^15 — portable to any
engine with md5 (DuckDB oracle: identical expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(16 ** 15)  # 2^60: fits exactly in a double


def uniform_hash(id_col: Column, salt: str = "samp:") -> Column:
    """Deterministic uniform [0, 1) from an id column (md5-derived)."""
    h = F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 15)
    return F.conv(h, 16, 10).cast("double") / F.lit(_DENOM)


def uniform_hash_sql(id_expr: str, salt: str = "samp:") -> str:
    """DuckDB rendering of :func:`uniform_hash` (bit-identical)."""
    return (
        f"CAST(CAST(concat('0x', substring(md5(concat('{salt}', "
        f"CAST({id_expr} AS VARCHAR))), 1, 15)) AS BIGINT) AS DOUBLE)"
        f" / {_DENOM}"
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "samp:",
) -> DataFrame:
    """Keep each row iff its uniform hash falls under its stratum's
    fraction — per-stratum Bernoulli sampling with deterministic
    membership.  Scale shape: a single filter over the scan (no shuffle,
    no state); the fraction map rides as a literal CASE."""
    frac = F.lit(float(default_fraction))
    for k in sorted(fractions):
        frac = F.when(
            F.col(strata_col) == F.lit(k), F.lit(float(fractions[k]))
        ).otherwise(frac)
    return df.where(uniform_hash(F.col(id_col), salt) < frac)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuf:",
    n_partitions: int | None = None,
) -> DataFrame:
    """Global pseudo-random training-order shuffle: repartition by the
    uniform hash (uniform data distribution regardless of source skew)
    and sort within partitions by it — the standard pre-training corpus
    shuffle, but a pure function of (salt, id): re-runs, retries, and
    resumed jobs see the identical order.  Change ``salt`` per epoch.
    Reading partition files in name order yields the full permutation."""
    u = uniform_hash(F.col(id_col), salt)
    out = df.withColumn("_shuf", u)
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        out.repartitionByRange(n, "_shuf")
        # id tiebreak: two ids colliding on the 60-bit hash (expected
        # at ~1.5B-row scale) would otherwise order arbitrarily
        # between a run and its retry, breaking the documented
        # idempotence (review finding, round 8; the sibling samplers
        # already tiebreak by id)
        .sortWithinPartitions("_shuf", id_col)
        .drop("_shuf")
    )


def deterministic_topk_per_stratum(
    df: DataFrame,
    k: int,
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "samp:",
) -> DataFrame:
    """Exactly-k-per-stratum sample: rank rows inside each stratum by
    their uniform hash (ties broken by id) and keep the first k — a
    deterministic reservoir.  One shuffle on the stratum key; partial
    ``min(struct)`` thinning is not applicable to rank-k, so at extreme
    skew pre-filter with :func:`stratified_sample` at a safe over-sample
    fraction first, then exact-rank the survivors."""
    from pyspark.sql import Window

    u = uniform_hash(F.col(id_col), salt)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(u.asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    salt: str = "wsamp:",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir"): each
    row gets key ``u^(1/w)`` with ``u`` the md5-uniform variate and
    ``w`` its weight; the k largest keys are an exact weighted sample.
    Like every sampler here there is no ``rand()`` — re-runs, retries,
    and the DuckDB oracle reproduce the identical sample.

    Rows with weight <= 0 or null are excluded (zero-weight items have
    sampling probability 0; E-S keys are undefined for them).  Output
    adds ``sample_rank`` (1 = largest key).  With ``strata_col``, top-k
    per stratum (one shuffle on the stratum key); without, a global
    TakeOrdered-style sort+limit (no full-sort shuffle: Spark's
    ``orderBy.limit(k)`` plans as a per-partition top-k + driver-side
    merge of k·partitions candidates)."""
    from pyspark.sql import Window

    w_val = F.col(weight_col).cast("double")
    u = uniform_hash(F.col(id_col), salt)
    key = F.pow(u, F.lit(1.0) / w_val)
    filtered = df.where(w_val > 0).withColumn("_es_key", key)
    if strata_col is not None:
        win = Window.partitionBy(strata_col).orderBy(
            F.col("_es_key").desc(), F.col(id_col).asc()
        )
        return (
            filtered.withColumn("sample_rank", F.row_number().over(win))
            .where(F.col("sample_rank") <= k)
            .drop("_es_key")
        )
    topk = (
        filtered.orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
        .limit(k)
    )
    win = Window.orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
    # ranking k rows on one partition is fine: limit(k) already
    # materialized the global top-k
    return (
        topk.withColumn("sample_rank", F.row_number().over(win))
        .drop("_es_key")
    )


def split_by_group(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str,
    out_col: str = "split",
    salt: str = "split:",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every row of the same
    GROUP (domain, source document, conversation, …) lands in the same
    split, because the assignment hashes the group key, not the row id —
    the guard against near-duplicate leakage across splits that row-wise
    sampling cannot give.  ``fractions`` maps split name → fraction
    (must sum to ≤ 1; remainder falls into the last split listed).

    Pure row-local Column exprs (one md5 per row, no shuffle); fully
    deterministic — re-runs, retries, and any md5-capable SQL engine
    assign identical splits."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    u = uniform_hash(F.col(group_col).cast("string"), salt)
    names = list(fractions)
    expr = F.lit(names[-1])
    acc = 0.0
    cuts = []
    for name in names:
        acc += float(fractions[name])
        cuts.append((name, acc))
    for name, hi in reversed(cuts):
        expr = F.when(u < F.lit(hi), F.lit(name)).otherwise(expr)
    # a NULL group key gets a NULL split — surface it, don't guess:
    # uniform_hash(NULL) is NULL, every WHEN fell through, and ALL
    # malformed rows landed in the LAST listed split (typically the
    # eval set — review finding, round 8; split_by_time already
    # documents the null→null contract)
    expr = F.when(F.col(group_col).isNotNull(), expr)
    return df.withColumn(out_col, expr)


def split_by_time(
    df: DataFrame,
    ts_col: str,
    train_end,
    embargo: str = "0 seconds",
    test_end=None,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe temporal split: ``split`` ∈ train / embargo / test
    / null.  ``train`` is strictly before ``train_end``; an ``embargo``
    buffer after it is assigned to NEITHER side (rows whose influence
    straddles the boundary — label lookahead, rolling features — leak
    into test without it: the purged/embargoed split of the
    backtesting literature, López de Prado 2018 ch.7); ``test`` runs
    from the embargo end to ``test_end`` (unbounded when None).  Rows
    with null timestamps get a null split (surface them, don't guess).
    Pure Columns — one scan, no shuffle; the split column is a stable
    function of the timestamp so re-runs and backfills agree."""
    from qualityassurancetool_spark.functions.timeutils import (
        parse_timedelta_seconds,
    )

    train_end_c = F.lit(train_end).cast("timestamp")
    emb_s = parse_timedelta_seconds(embargo)
    emb_end = train_end_c + F.make_dt_interval(secs=F.lit(float(emb_s)))
    ts = F.col(ts_col)
    split = (
        F.when(ts.isNull(), F.lit(None).cast("string"))
        .when(ts < train_end_c, F.lit("train"))
        .when(ts < emb_end, F.lit("embargo"))
    )
    if test_end is not None:
        split = split.when(
            ts < F.lit(test_end).cast("timestamp"), F.lit("test")
        )
    else:
        split = split.when(ts >= emb_end, F.lit("test"))
    return df.withColumn(out_col, split)

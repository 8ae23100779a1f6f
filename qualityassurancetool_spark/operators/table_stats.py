"""One-pass table statistics — the ANALYZE-shape profile.

Every cost-based decision this engine cares about (broadcast vs
shuffle join, AQE skew handling, partition sizing, `suggest_qc_ranges`
calibration) starts from the same per-column facts: row count, null
fraction, min/max, mean, distinct count, quantiles.  Exact versions of
the last two are the classic 100 TB traps (full-key shuffle; per-value
sort) — so this profile computes the exact cheap stats and the
SKETCHED expensive ones (``operators/hll`` distinct, ``operators/
ddsketch`` quantiles) in a bounded number of scans: ONE scan for all
exact stats + one cells-only pass per sketch family, never a per-value
or per-key shuffle.

Output is long-format ``(column, stat, value)`` — double-valued so
every stat of every column unions into one frame (min/max of
non-numeric columns are omitted rather than coerced).

Cross-engine: ``tools/extra_oracles.py::x_table_profile`` replicates
the exact stats with plain SQL aggregates and the sketched stats with
the same DuckDB replicas proven for ``hll_distinct`` /
``ddsketch_quantiles``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    ndv_p: int = 12,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    alpha: float = 0.02,
) -> DataFrame:
    """Long-format profile ``(column, stat, value)``.

    Stats per column: ``count`` (non-null), ``null_count``; numeric
    columns add exact ``min``/``max``/``mean``, sketched
    ``ndv_est`` (HLL, every column) and ``q<prob>`` rows (DDSketch,
    numeric).  All doubles; exact integer stats cast losslessly for
    counts < 2^53."""
    from qualityassurancetool_spark.operators.ddsketch import (
        ddsketch_build,
        ddsketch_quantiles,
    )
    from qualityassurancetool_spark.operators.hll import hll_distinct_by

    if columns is None:
        columns = [f.name for f in df.schema.fields]
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _NUMERIC) and f.name in columns
    }
    # one scan: every exact stat for every column in a single agg row
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.col(c)).cast("double").alias(f"{c}::count"),
            F.sum(F.col(c).isNull().cast("long"))
            .cast("double")
            .alias(f"{c}::null_count"),
        ]
        if c in numeric:
            aggs += [
                F.min(F.col(c)).cast("double").alias(f"{c}::min"),
                F.max(F.col(c)).cast("double").alias(f"{c}::max"),
                F.avg(F.col(c)).cast("double").alias(f"{c}::mean"),
            ]
    one = df.agg(*aggs)
    exact = one.selectExpr(
        "stack({n}, {args}) as (column, stat, value)".format(
            n=len(one.columns),
            args=", ".join(
                f"'{name.split('::')[0]}', '{name.split('::')[1]}', "
                f"`{name}`"
                for name in one.columns
            ),
        )
    )
    spark = df.sparkSession
    parts = [exact]
    for c in columns:
        ndv = hll_distinct_by(
            df.select(F.lit(c).alias("column"), F.col(c)),
            ["column"],
            c,
            p=ndv_p,
        ).select(
            "column",
            F.lit("ndv_est").alias("stat"),
            F.col("est_distinct").alias("value"),
        )
        parts.append(ndv)
    for c in sorted(numeric):
        sk = ddsketch_build(
            df.select(F.lit(c).alias("column"), F.col(c)),
            c,
            ["column"],
            alpha=alpha,
        )
        qs = ddsketch_quantiles(
            sk, list(quantiles), ["column"], alpha=alpha
        ).select(
            "column",
            F.concat(F.lit("q"), F.col("prob").cast("string")).alias(
                "stat"
            ),
            F.col("est").alias("value"),
        )
        parts.append(qs)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

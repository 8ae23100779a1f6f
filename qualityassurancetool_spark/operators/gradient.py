"""Per-stream time gradient with exact ``np.gradient`` parity (reference W7:
``calc_gradient_results`` call ``src/main.py:518``; exactness pinned to
``np.gradient`` at ``tests/test_qc.py:446-510``).

``np.gradient(f, t)`` on a non-uniform grid uses the second-order central
difference in the interior and one-sided first-order differences at the
edges.  With ``hs = t[i]-t[i-1]`` (backward step) and ``hd = t[i+1]-t[i]``
(forward step):

    interior:  (hs²·f[i+1] + (hd²−hs²)·f[i] − hd²·f[i-1]) / (hs·hd·(hd+hs))
    first row: (f[1]-f[0]) / (t[1]-t[0])
    last row:  (f[n-1]-f[n-2]) / (t[n-1]-t[n-2])

All of it is lag/lead Column arithmetic over one per-stream window — a
single shuffle on the stream key, then whole-stage codegen.  Single-row
groups get null (np.gradient would raise; we stay total).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.timeutils import epoch_micros


def gradient_expr(w, value_col: str, t_us: Column) -> Column:
    """The np.gradient-parity expression over an explicit window spec and
    integer-microsecond order column — shared by the per-stream window
    (below) and the bucketed streams×buckets twin
    (``partitioned_windows.calc_gradient_bucketed``)."""
    f_ = F.col(value_col)
    t_prev_null = F.lag(t_us).over(w).isNull()
    t_next_null = F.lead(t_us).over(w).isNull()
    f_prev, f_next = F.lag(f_).over(w), F.lead(f_).over(w)

    hs = (t_us - F.lag(t_us).over(w)) / F.lit(1_000_000.0)
    hd = (F.lead(t_us).over(w) - t_us) / F.lit(1_000_000.0)

    interior = (
        hs * hs * f_next + (hd * hd - hs * hs) * f_ - hd * hd * f_prev
    ) / (hs * hd * (hd + hs))
    first = (f_next - f_) / hd
    last = (f_ - f_prev) / hs

    return (
        F.when(t_prev_null & t_next_null, F.lit(None).cast("double"))
        .when(t_prev_null, first)
        .when(t_next_null, last)
        .otherwise(interior)
    )


def gradient_column(
    value_col: str,
    ts_col: str,
    partition_cols: list[str],
    order_extra: list[str] | None = None,
) -> Column:
    """Column expression for the np.gradient-parity time derivative.
    Parameter-determined, so the built tree is memoized per session
    (functions/exprmemo) — repeated QC-chain builds reuse it."""
    from qualityassurancetool_spark.functions.exprmemo import memoized_expr

    def _build() -> Column:
        order_cols = [F.col(ts_col)] + [
            F.col(c) for c in (order_extra or [])
        ]
        w = Window.partitionBy(*partition_cols).orderBy(*order_cols)

        # Steps from exact integer-µs differences: subtracting epoch
        # *doubles* (~1.7e9 s) loses ~0.25 µs to cancellation, which a
        # second-order difference amplifies to ~1e-6 relative error.
        # Long-µs diffs are exact.
        return gradient_expr(w, value_col, epoch_micros(ts_col))

    return memoized_expr(
        (
            "gradient_column",
            value_col,
            ts_col,
            tuple(partition_cols),
            tuple(order_extra or []),
        ),
        _build,
    )


def calc_gradient(
    df: DataFrame,
    value_col: str = "result",
    ts_col: str = "phenomenon_time",
    group_col: str | list[str] = "datastream_id",
    out_col: str = "gradient",
    order_extra: list[str] | None = None,
) -> DataFrame:
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    return df.withColumn(
        out_col, gradient_column(value_col, ts_col, groups, order_extra)
    )


def gradient_sql(
    value: str,
    epoch_us_expr: str,
    partition_by: str,
    order_by: str,
) -> str:
    """DuckDB-oracle SQL fragment computing the identical gradient.
    ``epoch_us_expr`` must be integer microseconds (exact diffs, see above).
    """
    w = f"OVER (PARTITION BY {partition_by} ORDER BY {order_by})"
    t, f_ = epoch_us_expr, value
    tp, tn = f"lag({t}) {w}", f"lead({t}) {w}"
    fp, fn = f"lag({f_}) {w}", f"lead({f_}) {w}"
    hs = f"((({t}) - ({tp})) / 1000000.0)"
    hd = f"((({tn}) - ({t})) / 1000000.0)"
    interior = (
        f"(({hs})*({hs})*({fn}) + (({hd})*({hd}) - ({hs})*({hs}))*({f_})"
        f" - ({hd})*({hd})*({fp})) / (({hs})*({hd})*(({hd}) + ({hs})))"
    )
    return (
        f"CASE WHEN ({tp}) IS NULL AND ({tn}) IS NULL THEN NULL "
        f"WHEN ({tp}) IS NULL THEN (({fn}) - ({f_})) / ({hd}) "
        f"WHEN ({tn}) IS NULL THEN (({f_}) - ({fp})) / ({hs}) "
        f"ELSE {interior} END"
    )

"""RFM segmentation — recency / frequency / monetary customer scoring.

The classic warehouse segmentation: per customer, days since last
order (recency), order count (frequency), total spend (monetary),
each quantile-binned 1..n (n highest = best: most recent, most
frequent, biggest spender), concatenated into the RFM cell ("555" =
champions).  Marketing's workhorse — and a good Catalyst citizen: a
single groupBy on the customer key, then three ``ntile`` windows
over the CUSTOMER-level aggregate (cardinality = customers, not
orders — the expensive input never enters a window).

Determinism: ``ntile`` depends on its total order, so every window
orders by (metric, customer-id) — bit-identical across engines and
reruns, which the cross-engine oracle
(``tools/extra_oracles.py::x_rfm``) relies on.

Scale note: the three windows are unpartitioned by design (a global
quantile rank is the SEMANTICS) — at 10^9 customers a single-ntile
sort becomes the bottleneck, and the right move is the same one
``operators/ddsketch`` makes for quantiles: bin by sketch cut-points
instead of exact ranks.  ``rfm_segments(approx=True)`` does exactly
that via ``percentile_approx`` cut-points with one aggregation and
NO global sort, at the price of approximate bin edges near
boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_bins: int = 5,
    as_of=None,
    approx: bool = False,
) -> DataFrame:
    """``(customer, recency_days, frequency, monetary, r, f, m,
    rfm_cell)`` per customer with at least one dated order.

    ``as_of``: reference date for recency (a date/`Column`/ISO
    string); defaults to the max order date in the input.
    ``approx``: bin by ``percentile_approx`` cut-points instead of
    exact ntile — no global sort, for customer cardinalities where
    a single-partition window is the bottleneck.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    o = orders.where(
        F.col(customer_col).isNotNull() & F.col(date_col).isNotNull()
    )
    per_cust = o.groupBy(F.col(customer_col).alias("customer")).agg(
        F.max(date_col).alias("_last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(amount_col).alias("_spend"),
    )
    if as_of is None:
        # one scalar, broadcast-joined (lazy; no driver action)
        ref = o.agg(F.max(date_col).alias("_asof"))
        per_cust = per_cust.crossJoin(F.broadcast(ref))
    else:
        asof_col = (
            as_of
            if isinstance(as_of, Column)
            else F.lit(str(as_of)).cast("date")
        )
        per_cust = per_cust.withColumn("_asof", asof_col)
    base = per_cust.select(
        "customer",
        F.datediff("_asof", "_last").cast("long").alias(
            "recency_days"
        ),
        "frequency",
        F.round("_spend", 2).alias("monetary"),
    )
    if approx:
        cuts = base.agg(
            *[
                F.percentile_approx(
                    c,
                    [i / n_bins for i in range(1, n_bins)],
                    10_000,
                ).alias(f"_cut_{c}")
                for c in ("recency_days", "frequency", "monetary")
            ]
        )
        base = base.crossJoin(F.broadcast(cuts))

        def bucket(c: str) -> Column:
            arr = F.col(f"_cut_{c}")
            # rank = 1 + number of cut-points <= value
            return (
                F.lit(1)
                + F.size(F.filter(arr, lambda x: x <= F.col(c)))
            ).cast("int")

        r = (F.lit(n_bins + 1) - bucket("recency_days")).cast("int")
        f_ = bucket("frequency")
        m = bucket("monetary")
    else:
        # deterministic total orders: (metric, customer) tie-break
        r = F.ntile(n_bins).over(
            Window.orderBy(
                F.col("recency_days").desc(), F.col("customer").asc()
            )
        )
        f_ = F.ntile(n_bins).over(
            Window.orderBy(
                F.col("frequency").asc(), F.col("customer").asc()
            )
        )
        m = F.ntile(n_bins).over(
            Window.orderBy(
                F.col("monetary").asc(), F.col("customer").asc()
            )
        )
    return base.select(
        "customer",
        "recency_days",
        "frequency",
        "monetary",
        r.alias("r"),
        f_.alias("f"),
        m.alias("m"),
    ).withColumn(
        "rfm_cell",
        F.concat_ws("", F.col("r"), F.col("f"), F.col("m")),
    )

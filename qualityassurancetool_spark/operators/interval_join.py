"""Point-in-interval lookup join without a range-join blowup.

Enrichment against interval tables (IP→geo CIDR ranges, price bands,
time validity windows, size-class tables) is a `BETWEEN` join.  Spark
plans a raw ``p JOIN i ON p.x BETWEEN i.lo AND i.hi`` as a broadcast
nested loop (or worse, a cartesian + filter) — O(|points|·|intervals|)
comparisons, the same trap SURVEY §2 J3 documents for the as-of join.

The scalable shape is the as-of bucketing trick generalized to
variable-width intervals: pick a ``bucket_width`` w, explode each
interval into the integer buckets it spans (``sequence(floor(lo/w),
floor(hi/w))``), bucket each point once (``floor(x/w)``), and
equi-join on the bucket with the BETWEEN as a residual condition.  A
point joins only its own bucket, and an interval appears at most once
per bucket, so matches are exact and never duplicated — no dedup pass.

Cost: shuffle of |points| + Σ spans/w interval replicas on an integer
key; Catalyst plans a shuffled (or broadcast) HASH join, never a
nested loop.  Pick w near the median interval width so typical
intervals replicate into O(1) buckets.  Degenerate wide intervals are
the failure mode (a [0, ∞) row would explode forever): ``sequence``
growth is capped by ``max_span_buckets`` with an explicit runtime
error rather than a silent runaway.

Cross-engine checkable: the bucketing is an implementation detail, so
the DuckDB oracle is the plain BETWEEN join
(``tools/extra_oracles.py::x_interval_join``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_lookup(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    how: str = "inner",
    broadcast_intervals: bool = False,
    max_span_buckets: int = 4096,
) -> DataFrame:
    """All columns of ``points`` + all columns of ``intervals`` for
    every (point, interval) pair with ``lo <= point <= hi`` (inclusive
    both ends — the SQL BETWEEN convention).

    ``how``: ``"inner"`` keeps matched pairs; ``"left"`` keeps
    unmatched points with null interval columns (enrichment mode).
    ``broadcast_intervals``: hint when the exploded interval side is
    dimension-sized — bucket-key broadcast HASH join, zero shuffle of
    the point side.

    Intervals with null bounds never match (SQL semantics); null
    points survive only in ``how="left"``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    w = float(bucket_width)

    dup = set(points.columns) & set(intervals.columns)
    if dup:
        raise ValueError(
            f"overlapping column names {sorted(dup)}: rename before joining"
        )

    lo_b = F.floor(F.col(lo_col) / w)
    hi_b = F.floor(F.col(hi_col) / w)
    guarded_hi = F.when(
        hi_b - lo_b > F.lit(max_span_buckets),
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval spans more than {max_span_buckets} buckets "
                    f"at bucket_width={w}: split the interval or raise "
                    "bucket_width/max_span_buckets; offending lo="
                ),
                F.col(lo_col).cast("string"),
                F.lit(" hi="),
                F.col(hi_col).cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(hi_b)
    iv = intervals.where(
        F.col(lo_col).isNotNull()
        & F.col(hi_col).isNotNull()
        & (F.col(lo_col) <= F.col(hi_col))
    ).withColumn("_ib", F.explode(F.sequence(lo_b, guarded_hi)))
    if broadcast_intervals:
        iv = F.broadcast(iv)

    pt = points.withColumn("_pb", F.floor(F.col(point_col) / w))
    cond = (
        (pt["_pb"] == iv["_ib"])
        & (pt[point_col] >= iv[lo_col])
        & (pt[point_col] <= iv[hi_col])
    )
    return pt.join(iv, cond, how).drop("_pb", "_ib")

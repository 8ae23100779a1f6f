"""Point-in-time (SCD Type 2) dimension lookup.

QC configs, sensor calibrations, and curation rule sets change over
time; re-running history must join each fact to the dimension version
that was valid AT THE FACT'S TIMESTAMP, not the current one (the
reference pins one config per run — `conf/config.yaml` — so re-runs
against old windows silently use new thresholds; versioned dimensions
are the standard warehouse fix).

Shape: versions of a key form half-open validity intervals
[valid_from, valid_to).  Unlike the generic ``interval_join`` (which
buckets because intervals share one global axis), SCD2 joins carry the
NATURAL KEY: the equi-join on key already bounds candidates to that
key's few versions, so the plan is a plain hash join (broadcast for
dimension-sized tables) with the BETWEEN as a residual — no bucketing,
no nested loop.

Correct results require the dimension to be well-formed (no
overlapping versions per key): ``scd2_violations`` checks that with
one window pass over the dimension (lag by key, ordered by
valid_from) — run it at publish time, not per lookup.

Cross-engine checkable: ``tools/extra_oracles.py::x_scd2`` (plain SQL
join on key + half-open BETWEEN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_violations(
    dim: DataFrame,
    key: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Rows of ``dim`` that break SCD2 well-formedness, tagged with
    ``violation``: ``empty`` (from >= to, matches nothing),
    ``null_bound`` (either bound null), or ``overlap`` (starts before
    the latest end among ALL earlier-starting versions of the same key
    — a running max, not just the immediately preceding row, so a
    short version contained inside a long one tags the contained row
    too).  Empty result ⇔ every timestamp matches at most one version
    per key."""
    w = Window.partitionBy(key).orderBy(from_col)
    prev_to = F.max(to_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    v = (
        F.when(
            F.col(from_col).isNull() | F.col(to_col).isNull(),
            F.lit("null_bound"),
        )
        .when(F.col(from_col) >= F.col(to_col), F.lit("empty"))
        .when(
            prev_to.isNotNull() & (F.col(from_col) < prev_to),
            F.lit("overlap"),
        )
    )
    return dim.withColumn("violation", v).where(
        F.col("violation").isNotNull()
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Facts + the dimension version valid at ``ts_col``
    (``valid_from <= ts < valid_to``, the half-open SCD2 convention —
    adjacent versions share a boundary instant without double-matching).

    ``how="left"`` keeps facts with no valid version (null dim
    columns); ``"inner"`` drops them.  PRECONDITION: ``dim`` passes
    :func:`scd2_violations` — an overlapping dimension duplicates
    facts (by design: silently picking one version would hide the data
    bug; validate at publish time instead)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    overlap = set(facts.columns) & set(dim.columns)
    if overlap - {key}:
        raise ValueError(
            f"overlapping non-key columns {sorted(overlap - {key})}: "
            "rename before joining"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    cond = (
        (facts[key] == d[key])
        & (facts[ts_col] >= d[from_col])
        & (facts[ts_col] < d[to_col])
    )
    return facts.join(d, cond, how).drop(d[key])

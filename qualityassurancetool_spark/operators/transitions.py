"""First-order event-transition matrix — P(next event type | type).

The Markov-chain summary of an event stream: for each consecutive
pair of events within a user's timeline, count (from_type, to_type)
and row-normalize into transition probabilities.  The standard
clickstream diagnostic (where do users go after an error?), and the
generator behind session-simulation test data.

Spark shape: one shuffle on the user key, a lag window over each
user's time-ordered stream (tie-broken by an explicit id column for
determinism), then the (from, to) count reduces to |types|² rows —
driver-trivial output — and the row-normalizer is a window over that
tiny frame.  Same event-stream family as ``operators/sessionize.py``
/ ``operators/funnel.py`` / ``operators/cohort.py``.

Cross-engine: ``tools/extra_oracles.py::x_transitions`` — DuckDB
lag-window replica with the same tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_extra: list[str] | None = None,
) -> DataFrame:
    """``(from_type, to_type, n, p)`` over consecutive event pairs
    per user.  ``p`` = n / total transitions out of ``from_type``,
    rounded to 6 dp.  Rows with NULL timestamp or type are ignored;
    users with a single event contribute nothing.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_extra or [])
    ]
    w = Window.partitionBy(user_col).orderBy(*order)
    ev = events.where(
        F.col(ts_col).isNotNull() & F.col(type_col).isNotNull()
    )
    pairs = (
        ev.select(
            F.lag(type_col).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wrow = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wrow), 6).alias("p"),
    )

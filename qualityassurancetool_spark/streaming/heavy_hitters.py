"""Streaming heavy hitters with BOUNDED state.

A streaming ``groupBy(key).count()`` keeps one state row per distinct
key forever — on a token/URL stream that is unbounded-state by
construction (the hazard ``streaming_exact_dedup`` documents for
``dropDuplicates``).  The batch operator's fix
(``operators/heavy_hitters``: Misra–Gries summaries, mergeable per
Agarwal et al. PODS 2012) ports directly: shard the key stream into a
FIXED number of sketch shards (hash-mod — the shard is the state key),
and keep one MG summary of at most ``capacity`` counters per shard in
``applyInPandasWithState``.  Total state ≤ n_shards × capacity rows no
matter how many distinct keys flow past; each micro-batch shuffles
only (shard, key) pairs.

Every batch emits the updated summaries (update semantics).  The union
of shard summaries is a guaranteed candidate superset of keys whose
GLOBAL share exceeds 1/(capacity+1) (averaging argument over shards —
same proof as the batch operator's partition bound), and summary
counts are lower bounds with per-shard deficit ≤ n_shard/(capacity+1).
Confirm exact counts downstream with the batch verify pass over the
landed data when exactness matters.

Parity: the in-state merge is byte-for-byte the batch kernel's
(value_counts add + prune by the (capacity+1)-th largest), tested
against ``operators/heavy_hitters.mg_candidates`` on the same data.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), True),
        T.StructField("key", T.StringType(), True),
        T.StructField("count_lb", T.LongType(), True),
    ]
)

HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
    ]
)


# the in-state merge IS the batch kernel's merge — one function, no
# duplication-by-convention (operators/heavy_hitters.mg_merge)
from qualityassurancetool_spark.operators.heavy_hitters import mg_merge


def streaming_heavy_hitter_summaries(
    stream: DataFrame,
    key_col: str,
    capacity: int = 256,
    n_shards: int = 32,
) -> DataFrame:
    """(shard, key, count_lb) — each micro-batch re-emits every updated
    shard's full MG summary (update output mode).  ``n_shards`` bounds
    both state and per-batch shuffle width; one shard's summary must
    fit comfortably in an executor (capacity strings — trivially so)."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    def update(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        if state.exists:
            keys, cnts = state.get
            counts = dict(zip(list(keys), [int(c) for c in cnts]))
        else:
            counts = {}
        for pdf in pdfs:
            if len(pdf):
                counts = mg_merge(
                    counts, pdf["_hh_key"].value_counts(), capacity
                )
        state.update((list(counts.keys()), list(counts.values())))
        yield pd.DataFrame(
            {
                "shard": shard,
                "key": list(counts.keys()),
                "count_lb": list(counts.values()),
            }
        )

    keyed = stream.select(
        F.col(key_col).cast("string").alias("_hh_key")
    ).where(F.col("_hh_key").isNotNull())
    sharded = keyed.withColumn(
        "_hh_shard", F.pmod(F.xxhash64("_hh_key"), F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy("_hh_shard").applyInPandasWithState(
        update,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

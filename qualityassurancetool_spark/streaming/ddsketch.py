"""Streaming DDSketch with bounded state.

The streaming twin of ``operators/ddsketch`` (same pattern as
``streaming/hll``): a streaming exact-percentile would buffer every
value; the DDSketch bucket table is at most
``stores × log_gamma(max/min)`` scalar counters (~1.4 k cells for a
1e-6..1e12 range at alpha=1 %), independent of row count, with the
±alpha relative-error guarantee intact forever.

Each element maps to its (sign, bucket) cell with the SAME bucket
Column as the batch operator (``operators/ddsketch.ddsketch_build``
semantics — one code path), the stream groups by cell, and each
cell's state is its scalar running count.  Counts are plain sums, so
the streamed sketch is CELL-EXACT equal to ``ddsketch_build`` over
everything that has flowed past — pinned by
``tests/test_ddsketch.py`` including across a checkpoint restart —
and ``operators/ddsketch.ddsketch_quantiles`` reads the sink
directly (the sink is an upsert store: update mode re-emits only the
cells a batch touched).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qualityassurancetool_spark.operators.ddsketch import bucket_index

DD_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("sign", T.IntegerType(), True),
        T.StructField("bucket", T.IntegerType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)

DD_STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType(), True)])


def streaming_ddsketch(
    stream: DataFrame, value_col: str, alpha: float = 0.01
) -> DataFrame:
    """(sign, bucket, n) updated cells per micro-batch — state is one
    counter per occupied bucket, bounded by the value range."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sign, bucket = int(key[0]), int(key[1])
        n = int(state.get[0]) if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame(
            {"sign": [sign], "bucket": [bucket], "n": [n]}
        )

    v = F.col(value_col).cast("double")
    cells = stream.where(v.isNotNull()).select(
        F.when(v > 0, F.lit(1))
        .when(v < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .alias("sign"),
        F.when(v > 0, bucket_index(v, alpha))
        .when(v < 0, bucket_index(-v, alpha))
        .otherwise(F.lit(0))
        .alias("bucket"),
    )
    return cells.groupBy("sign", "bucket").applyInPandasWithState(
        update,
        outputStructType=DD_OUTPUT_SCHEMA,
        stateStructType=DD_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

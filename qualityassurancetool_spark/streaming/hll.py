"""Streaming HyperLogLog with FIXED state.

The streaming twin of ``operators/hll`` and third member of the
bounded-state sketch trio (``streaming/cms`` point frequencies,
``streaming/heavy_hitters`` hot keys, this one distinct counts): a
streaming ``dropDuplicates().count()`` grows state per distinct key
forever; the HLL register table is AT MOST ``2^p`` scalar states, no
watermark eviction needed, for the life of the stream.

Shape: each element maps to its ``(bucket, rank)`` with the SAME
integer-bit-ops hash as the batch operator
(``operators/hll._bucket_rank`` — one function, no
duplication-by-convention), the stream groups by BUCKET (≤ ``2^p``
state keys) and each bucket's state is the scalar running max rank in
``applyInPandasWithState``.  Registers are max-counters, so the
streamed register table is REGISTER-EXACT equal to
``hll_registers`` over everything that has flowed past — pinned by
``tests/test_streaming_hll.py`` including across a checkpoint restart
— and ``operators/hll.hll_estimate`` reads the sink directly.

Each micro-batch re-emits only the buckets it touched (update mode),
so the sink upsert is touched-buckets-sized, not ``m``-sized.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qualityassurancetool_spark.operators.hll import _bucket_rank, _check_p

HLL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), True),
        T.StructField("r", T.IntegerType(), True),
    ]
)

HLL_STATE_SCHEMA = T.StructType([T.StructField("r", T.IntegerType(), True)])


def streaming_hll(stream: DataFrame, key_col: str, p: int = 12) -> DataFrame:
    """(bucket, r) updated register rows per micro-batch — state is at
    most ``2^p`` scalar max-ranks, immutable in size."""
    _check_p(p)
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        bucket = int(key[0])
        best = int(state.get[0]) if state.exists else 0
        for pdf in pdfs:
            if len(pdf):
                best = max(best, int(pdf["r"].max()))
        state.update((best,))
        yield pd.DataFrame({"bucket": [bucket], "r": [best]})

    keyed = stream.select(
        F.col(key_col).cast("string").alias("_k")
    ).where(F.col("_k").isNotNull())
    bucket, r = _bucket_rank("_k", p)
    pairs = keyed.select(bucket.alias("bucket"), r.alias("r"))
    return pairs.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

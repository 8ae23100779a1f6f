"""Streaming KMV (bottom-k) sketch with bounded state.

Completes the streaming sketch family (``streaming/cms`` point
frequencies, ``streaming/hll`` distincts, ``streaming/ddsketch``
quantiles, ``streaming/heavy_hitters`` hot keys): a streaming distinct
set grows without bound; the KMV synopsis is at most ``shards × k``
hash values forever, and still answers distinct counts AND later set
algebra (``operators/kmv.kmv_set_compare`` against another corpus's
sketch).

Shape: elements hash with the SAME portable function as the batch
operator (``operators/kmv``), shard by ``h % shards`` (bounded state
keys, parallel updates), and each shard's state is its bottom-k
SORTED hash list in ``applyInPandasWithState``.  A shard's bottom-k is
a superset filter of the global bottom-k, so reading the sink is:
union shard rows → ``operators/kmv`` global bottom-k (a ≤ shards×k-row
batch step) — and the result is HASH-SET EXACT equal to
``kmv_sketch`` over everything that has flowed past (pinned by
``tests/test_streaming_kmv.py``, including across a checkpoint
restart).  Update mode re-emits only shards a batch touched; the sink
upserts per (shard, pos).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qualityassurancetool_spark.functions.hashing import md5_long
from qualityassurancetool_spark.operators.kmv import _SALT, _check_k

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), True),
        T.StructField("pos", T.IntegerType(), True),
        T.StructField("h", T.LongType(), True),
    ]
)

KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("hs", T.ArrayType(T.LongType()), True)]
)


def streaming_kmv(
    stream: DataFrame, key_col: str, k: int = 256, shards: int = 8
) -> DataFrame:
    """(shard, pos, h) updated bottom-k rows per micro-batch — state
    is ≤ ``shards × k`` longs, immutable in size."""
    _check_k(k)
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        have = list(state.get[0]) if state.exists else []
        seen = set(have)
        for pdf in pdfs:
            seen.update(int(x) for x in pdf["h"])
        best = sorted(seen)[:k]
        state.update((best,))
        yield pd.DataFrame(
            {
                "shard": shard,
                "pos": range(1, len(best) + 1),
                "h": best,
            }
        )

    hashes = (
        stream.select(F.col(key_col).cast("string").alias("_k"))
        .where(F.col("_k").isNotNull())
        .select(md5_long(F.col("_k"), salt=_SALT).alias("h"))
        .select(F.pmod(F.col("h"), F.lit(shards)).cast("int").alias("shard"), "h")
    )
    return hashes.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def read_streamed_kmv(sink: DataFrame, k: int = 256) -> DataFrame:
    """Global bottom-k (``h`` column, the ``kmv_sketch`` contract)
    from a (shard, pos, h) sink table — a ≤ shards×k-row batch step."""
    _check_k(k)
    return sink.select("h").distinct().orderBy("h").limit(k)

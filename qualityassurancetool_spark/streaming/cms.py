"""Streaming Count-Min sketch with FIXED state.

The streaming twin of ``operators/cms`` and the natural companion to
``streaming/heavy_hitters``: where the MG summaries answer "which keys
are hot right now", the CMS answers point-frequency queries over the
whole stream history — with state that is EXACTLY ``depth × width``
counters, forever, no matter how many distinct keys flow past (the
bounded-state property Structured Streaming needs; a streaming
``groupBy(key).count()`` would grow state per distinct key).

Shape: each element expands to its ``depth`` (row, col) cells with the
SAME md5 hash family as the batch operator (``operators/cms._cell`` —
one function, no duplication-by-convention), the stream groups by
sketch ROW (``depth`` state keys total), and each row's state is its
width-length counter vector updated per micro-batch in
``applyInPandasWithState``.  Every batch re-emits the updated rows'
non-zero cells (update mode), so the sink always holds a queryable
sketch table in ``operators/cms.cms_query``'s (row, col, n) format —
and because CMS cells are plain sums, the streamed sketch is
CELL-EXACT equal to ``cms_build`` over everything that has flowed past
(pinned by ``tests/test_streaming_cms.py``, including across a
checkpoint restart).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qualityassurancetool_spark.operators.cms import _cell

CMS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("row", T.IntegerType(), True),
        T.StructField("col", T.IntegerType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)

CMS_STATE_SCHEMA = T.StructType(
    [T.StructField("cells", T.ArrayType(T.LongType()), True)]
)


def streaming_cms(
    stream: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """(row, col, n) updated sketch cells per micro-batch — state is
    ``depth`` vectors of ``width`` counters, immutable in size."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        row = int(key[0])
        if state.exists:
            cells = [int(c) for c in state.get[0]]
        else:
            cells = [0] * width
        for pdf in pdfs:
            if len(pdf):
                for col, cnt in pdf["col"].value_counts().items():
                    cells[int(col)] += int(cnt)
        state.update((cells,))
        nz = [(c, n) for c, n in enumerate(cells) if n]
        yield pd.DataFrame(
            {
                "row": row,
                "col": [c for c, _ in nz],
                "n": [n for _, n in nz],
            }
        )

    keyed = stream.select(
        F.col(key_col).cast("string").alias("_k")
    ).where(F.col("_k").isNotNull())
    cells = keyed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cell(F.col("_k"), r, width).cast("int").alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_c")
    ).select("_c.row", "_c.col")
    return cells.groupBy("row").applyInPandasWithState(
        update,
        outputStructType=CMS_OUTPUT_SCHEMA,
        stateStructType=CMS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

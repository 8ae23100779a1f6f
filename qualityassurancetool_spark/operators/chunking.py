"""Document chunking and sequence packing for training-data pipelines.

Two operators a 100 TB text pipeline needs between curation and the
tokenizer:

- :func:`chunk_documents` — split every document into overlapping
  token-window chunks (context-length shaping).  Generator-style: the
  chunk index expands through ONE ``explode`` of a computed ``sequence``
  (a long doc never materializes all its chunks driver-side, and the
  explode is the only row-expanding operator in the plan).
- :func:`pack_documents` — greedy fixed-budget sequence packing: assign
  consecutive documents (within a partition key, in a deterministic
  order) to packs such that each pack's token total stays under the
  budget.  Implemented as a running-total window + bucket arithmetic —
  one shuffle on the pack key, no iteration, no UDFs.

Both are deterministic: chunk boundaries are pure arithmetic over token
counts; packing order is an explicit sort key, so retries and re-runs
produce identical packs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    norm_col: str | None = None,
) -> DataFrame:
    """One row per (doc, chunk): ``chunk_idx``, ``chunk_text``,
    ``n_chunk_tokens``.  Chunks are windows of whitespace tokens with
    ``overlap_tokens`` of left-overlap (stride = chunk − overlap); the
    final partial chunk is kept.  Short docs yield exactly one chunk.
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens

    from qualityassurancetool_spark.functions.hashing import normalize_text

    base = df.select(
        F.col(id_col),
        (
            F.col(norm_col)
            if norm_col
            else normalize_text(F.col(text_col))
        ).alias("_cnorm"),
    ).withColumn("_ctoks", F.split(F.col("_cnorm"), " "))
    n = F.when(F.length("_cnorm") == 0, F.lit(0)).otherwise(
        F.size("_ctoks")
    )
    # number of chunks: 1 + ceil(max(n - chunk, 0) / stride)
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / stride).cast("int")
    )
    withn = base.withColumn("_n", n).withColumn(
        "_chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    start = F.col("_chunk_idx") * stride  # 0-based token offset
    length = F.least(
        F.lit(chunk_tokens), F.col("_n") - start
    )
    chunk_toks = F.slice(F.col("_ctoks"), start + 1, length)
    return withn.select(
        id_col,
        F.col("_chunk_idx").alias("chunk_idx"),
        F.concat_ws(" ", chunk_toks).alias("chunk_text"),
        length.cast("int").alias("n_chunk_tokens"),
    )


def pack_documents(
    df: DataFrame,
    budget_tokens: int = 2048,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partition_cols: list[str] | None = None,
    max_doc_tokens: int | None = None,
) -> DataFrame:
    """In-order fixed-budget sequence packing as a running-total bucket.

    Exact greedy packing is sequentially dependent (every pack boundary
    shifts with every earlier doc's wasted tail), which would serialize
    at 100 TB; this uses the closed-form relaxation: bucket the running
    token prefix-sum by the budget (``floor(cumsum_before / budget)``)
    and renumber densely.  Bound: a pack's total is **< budget +
    max-doc-tokens** (the doc that straddles a bucket edge lands in the
    earlier bucket).  When the caller can bound document size — always
    true after :func:`chunk_documents`, where tokens ≤ chunk size — pass
    ``max_doc_tokens`` and the buckets shrink to ``budget −
    max_doc_tokens``, making ``budget`` a HARD cap (total < (budget −
    m) + m = budget) at the cost of up to ``m`` undershoot per pack.
    One window over (partition, id); no UDFs, no iteration; packs are
    deterministic under retries.

    Output: input columns + ``pack_id`` (dense, per partition key).

    Scale: EMPTY ``partition_cols`` means one global sequence — an
    ``Exchange SinglePartition`` that funnels every row through one
    task.  Deliberate for small frames; at corpus scale ALWAYS pass a
    partition key (shard, language, source…) — the pretrain capstone
    packs per output shard for exactly this reason.
    """
    eff = int(budget_tokens)
    if max_doc_tokens is not None:
        if max_doc_tokens >= budget_tokens:
            raise ValueError("max_doc_tokens must be < budget_tokens")
        eff = int(budget_tokens) - int(max_doc_tokens)
    parts = partition_cols or []
    w = Window.partitionBy(*parts).orderBy(id_col)
    tok = F.col(token_col).cast("long")
    cum_before = F.coalesce(
        F.sum(tok).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    bucket = F.floor(cum_before / F.lit(eff))
    out = df.withColumn("_bucket", bucket)
    # dense renumbering inside each partition key (buckets may be sparse
    # when single docs exceed the budget)
    wb = Window.partitionBy(*parts).orderBy("_bucket")
    return (
        out.withColumn("pack_id", F.dense_rank().over(wb) - 1)
        .drop("_bucket")
    )


def pack_offsets(
    packed: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Loader metadata for a :func:`pack_documents` output: within-pack
    ``seq_idx`` (0-based position of the document inside its pack) and
    ``pack_offset`` (token start — the attention-mask / position-id
    boundary a sequence-packed trainer needs to reset at document
    edges).  One window over (partition, pack_id, id); adds no shuffle
    beyond the packing's own key."""
    parts = list(partition_cols or [])
    w = Window.partitionBy(*parts, "pack_id").orderBy(id_col)
    tok = F.col(token_col).cast("long")
    return packed.withColumn(
        "seq_idx", F.row_number().over(w) - 1
    ).withColumn(
        "pack_offset",
        F.coalesce(
            F.sum(tok).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ),
    )

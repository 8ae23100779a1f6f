"""Cross-document duplicated-span removal (ExactSubstr-style dedup).

Re-expresses the exact-substring deduplication of Lee et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL 2022):
any token window of length ``window_tokens`` that occurs verbatim more
than once in the corpus (across OR within documents) is a duplicated
span; every occurrence except the globally first (smallest
(doc_id, position)) is removed from its document.  Overlapping and
adjacent removed windows merge into spans, and the cleaned document is
the remaining tokens in original order.

The paper builds a corpus-wide suffix array; the Spark-first shape is a
window-hash aggregation — the same plan family as MinHash banding:

 1. row-local window hashes: ``transform`` over token positions (one
    md5/polynomial hash per position, no Python stage);
 2. ONE groupBy on the 8-byte window hash with a partial-aggregable
    ``min(struct(doc_id, pos))`` → the canonical first occurrence (only
    (hash, doc, pos) longs cross the shuffle, never text);
 3. occurrences ≠ first become (doc_id, start) rows; a per-doc
    ``collect_list`` + row-local interval-merge fold turns them into
    merged spans — positions never explode ×window_tokens into a
    shuffle (the oracle does that, at oracle scale);
 4. a broadcast-sized? no — an equi-join back to the documents on
    doc_id rebuilds the cleaned text with pure array Columns.

At 100 TB this is shuffle-bounded by the window-hash agg (same key
cardinality as the corpus token count; AQE handles the skewed
boilerplate hashes, and a ``min_count`` pre-filter on hot hashes is the
documented cap).  A window shorter than the paper's 50 BPE tokens is
configurable — tests use small windows on whitespace tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import (
    md5_long,
    normalize_text,
)


def _ntok(norm: Column) -> Column:
    """Token count with the corpus convention: empty norm = 0 tokens
    (split('') yields [''], which is NOT a token)."""
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    )


def _window_hashes(toks: Column, L: int, hash_mode: str) -> Column:
    """array<struct<pos:int,h:long>> of window hashes at positions
    1..n-L+1 (empty below L tokens).  ``toks`` must be an attribute
    (CSE contract, functions/hashing.py)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (L - 1))
    if hash_mode == "portable":
        hash_at = lambda i: md5_long(F.concat_ws(" ", F.slice(toks, i, L)))
        body = F.transform(
            idx,
            lambda i: F.struct(
                i.cast("int").alias("pos"), hash_at(i).alias("h")
            ),
        )
    else:
        # polynomial combine over pre-hashed tokens: no window-string
        # allocation (the dedup fast path; same combine as
        # shingle_hashes_from_token_hashes, kept positional here)
        th = F.transform(toks, lambda t: F.xxhash64(t))
        p = F.lit(1099511628211)

        def combine(i: Column) -> Column:
            h = F.element_at(th, i)
            for j in range(1, L):
                h = h * p + F.coalesce(
                    F.element_at(th, i + j), F.lit(-40343)
                )
            return h

        body = F.transform(
            idx,
            lambda i: F.struct(
                i.cast("int").alias("pos"), combine(i).alias("h")
            ),
        )
    return F.when(n >= L, body).otherwise(
        F.array().cast("array<struct<pos:int,h:long>>")
    )


def _merge_starts(starts: Column, L: int) -> Column:
    """Sorted window starts → merged inclusive token intervals
    array<struct<s:int,e:int>> (overlap OR adjacency merges, matching
    gaps-and-islands semantics over the covered position set)."""
    empty = F.array().cast("array<struct<s:int,e:int>>")

    def step(acc: Column, s: Column) -> Column:
        last = F.element_at(acc, -1)
        e_new = (s + F.lit(L - 1)).cast("int")
        iv = F.struct(s.cast("int").alias("s"), e_new.alias("e"))
        extended = F.struct(
            last["s"].alias("s"), F.greatest(last["e"], e_new).alias("e")
        )
        return F.when(F.size(acc) == 0, F.array(iv)).otherwise(
            F.when(
                s <= last["e"] + 1,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(extended)
                ),
            ).otherwise(F.concat(acc, F.array(iv)))
        )

    return F.aggregate(F.array_sort(starts), empty, step)


def _staged_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """``(id, _norm, _t, _n)`` behind Generate barriers: CollapseProject
    would inline _norm into the tokenizer and _t into every per-position
    lambda (O(n²) regexp / split re-evaluation; see fingerprint.py
    note)."""
    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
    )

    normed = compute_behind_barrier(
        df.select(F.col(id_col), F.col(text_col)),
        {"_norm": normalize_text(F.col(text_col))},
    )
    return compute_behind_barrier(
        normed.select(id_col, "_norm"),
        {
            "_t": F.split(F.col("_norm"), " "),
            "_n": _ntok(F.col("_norm")),
        },
    )


def _dup_positions(wins: DataFrame, id_col: str) -> DataFrame:
    """``(id, pos)`` of every non-first occurrence among ``wins``
    (id, pos, h) rows — THE keep-first rule, shared verbatim by the
    monolithic and hash-sliced schedules (slices partition the hash
    space, and first-occurrence is decided per hash, so per-slice
    application is exact)."""
    firsts = wins.groupBy("h").agg(
        F.min(
            F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
        ).alias("f"),
        F.count(F.lit(1)).alias("c"),
    )
    return (
        wins.join(firsts.filter(F.col("c") >= 2), "h")
        .filter(
            ~(
                (F.col(id_col) == F.col("f.d"))
                & (F.col("pos") == F.col("f.p"))
            )
        )
        .select(id_col, "pos")
    )


def duplicated_span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 20,
    hash_mode: str = "portable",
) -> DataFrame:
    """(id, deduped, n_tokens_removed, n_spans): the corpus with every
    non-first occurrence of a duplicated ``window_tokens``-token window
    removed (keep-first = smallest (doc_id, position)).

    Cache lifetime: the window-rows persist below is left to executor
    storage LRU eviction by design — the result is lazy, so an eager
    unpersist here would run before the caller's action and defeat the
    cache.  A long-lived session looping over many corpora should use
    :func:`duplicated_span_dedup_batched`, which materializes to
    ``work_dir`` parquet instead of cache (review note, round 9)."""
    L = window_tokens
    staged = _staged_tokens(df, text_col, id_col)
    wins = (
        staged.select(
            id_col,
            F.explode(_window_hashes(F.col("_t"), L, hash_mode)).alias("w"),
        )
        .select(id_col, F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
        # persist: _dup_positions consumes wins TWICE (keep-first agg +
        # non-first join), and Catalyst shares no common subplans across
        # joins — unpersisted, the dominant per-position HOF extraction
        # runs twice (measured 457 s vs 178 s for the write-once batched
        # schedule at 1 M docs; the same lesson as fingerprint.py).  The
        # batched variant stays the bounded-memory path: it materializes
        # the window rows to parquet instead of cache.
        .persist()
    )

    dups = _dup_positions(wins, id_col)
    return _rebuild_clean_text(staged, dups, id_col, L)


def _rebuild_clean_text(
    staged: DataFrame, dups: DataFrame, id_col: str, L: int
) -> DataFrame:
    """Merge removed-window starts into spans per doc and rebuild the
    cleaned text from the staged token arrays (shared tail of the
    monolithic and hash-sliced schedules)."""
    spans = dups.groupBy(id_col).agg(
        _merge_starts(F.collect_list("pos"), L).alias("_iv")
    )
    joined = staged.join(spans, id_col, "left")
    iv = F.coalesce(
        F.col("_iv"), F.array().cast("array<struct<s:int,e:int>>")
    )
    toks, n = F.col("_t"), F.col("_n")
    keep_pos = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda p: (p <= n)
        & ~F.exists(iv, lambda v: (p >= v["s"]) & (p <= v["e"])),
    )
    return joined.select(
        F.col(id_col),
        F.when(
            n > 0,
            F.concat_ws(
                " ", F.transform(keep_pos, lambda p: F.element_at(toks, p))
            ),
        )
        .otherwise(F.lit(""))
        .alias("deduped"),
        (n - F.size(keep_pos)).cast("long").alias("n_tokens_removed"),
        F.size(iv).cast("long").alias("n_spans"),
    )


def duplicated_span_dedup_batched(
    df: DataFrame,
    work_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 20,
    hash_mode: str = "portable",
    hash_batches: int = 4,
) -> DataFrame:
    """:func:`duplicated_span_dedup` with BOUNDED peak exchange — the
    hash-sliced schedule for corpora whose window-hash volume exceeds
    one pass's shuffle budget (the exchange carries one ~40 B row per
    token position: measured 1.6 GB at 1 M 60-token docs, linear —
    ~16 GB at 10 M, past any single JVM's comfort; docs/SCALE.md).

    Identical output (keep-first is decided PER HASH, and the slices
    partition the hash space, so per-slice application is exact —
    parity-tested in ``tests/test_span_dedup.py``); different schedule:

    1. ONE extraction pass (the dominant CPU cost — per-position HOF
       hashing measured ~80 % of the monolithic wall) writes the
       exploded ``(id, pos, h)`` window rows to ``work_dir/wins``
       parquet, partitioned by hash slice;
    2. the keep-first aggregation + non-first join run once per slice
       over a partition-pruned read, shuffling ``1/hash_batches`` of
       the window volume per pass; per-slice (id, pos) removals append
       to ``work_dir/dups``;
    3. span merge + clean-text rebuild read the (duplication-sized)
       removals once, re-staging only the cheap normalize/split pass.
    """
    import os as _os

    if hash_batches < 1:
        raise ValueError(f"hash_batches must be >= 1, got {hash_batches}")
    spark = df.sparkSession
    L = window_tokens
    staged = _staged_tokens(df, text_col, id_col)
    wins_path = _os.path.join(work_dir, "wins")
    (
        staged.select(
            id_col,
            F.explode(_window_hashes(F.col("_t"), L, hash_mode)).alias("w"),
        )
        .select(
            id_col,
            F.col("w.pos").alias("pos"),
            F.col("w.h").alias("h"),
            F.pmod(F.col("w.h"), F.lit(hash_batches)).alias("_slice"),
        )
        .write.mode("overwrite")
        .partitionBy("_slice")
        .parquet(wins_path)
    )
    dups_path = _os.path.join(work_dir, "dups")
    for s in range(hash_batches):
        w = (
            spark.read.parquet(wins_path)
            .where(F.col("_slice") == s)  # partition-pruned read
            .select(id_col, "pos", "h")
        )
        (
            _dup_positions(w, id_col)
            .write.mode("overwrite" if s == 0 else "append")
            .parquet(dups_path)
        )
    dups = spark.read.parquet(dups_path)
    return _rebuild_clean_text(staged, dups, id_col, L)

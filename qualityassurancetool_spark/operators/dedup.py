"""Deduplication family for large-corpus pipelines (driver north-star,
/root/repo/BASELINE.json): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
 - exact dedup is one hash-shuffle on a 16-byte digest (group on md5, keep
   min id) — never on the raw text;
 - MinHash/LSH: shingle hashes are computed ONCE (token-hash polynomial,
   no shingle-string materialization in fast mode; md5-derived in the
   oracle-checked portable mode), signatures are 16 integer universal-hash
   mins over one hash-partitioned aggregation (only 16 longs per doc cross
   the shuffle), then candidates come from an equi-join on
   (band_id, band_hash) — the classic shuffle-bounded LSH; verification
   joins only candidate pairs and reuses the persisted shingle arrays;
 - SimHash: row-local bit aggregation over token hashes;
 - n-gram Jaccard: blocked self-join (same language + length bucket) to
   bound the pair space, exact array-intersection Jaccard on candidates.

Everything is deterministic and, where oracle-checked, built exclusively
from md5-based hashing that DuckDB reproduces bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import (
    md5_long,
    normalize_text,
    shingle_hashes_from_token_hashes,
    shingles,
    shingles_from_tokens,
    token_hashes,
    tokens,
)


# ---------------------------------------------------------------- exact

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the smallest id per normalized-text digest.  Returns
    (content_hash, keep_id, n_dups)."""
    h = F.md5(normalize_text(F.col(text_col))).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# ---------------------------------------------------------------- minhash

def minhash_signature(
    text: Column, num_hashes: int = 16, shingle_k: int = 3
) -> Column:
    """array<long> MinHash signature.

    Hash family i is native ``xxhash64(i, shingle)`` — JVM-side, ~100×
    cheaper than an md5+hex-parse per shingle, which dominated the whole
    dedup pipeline when this used salted md5 (118 s → ~2 s at sf0.1).
    MinHash has no cross-engine oracle, so engine-native hashing is fine;
    oracle-checked operators keep md5 (functions/hashing.py).

    NB: close over the hash index with a factory — a `lambda s, i=i:`
    default arg would change the lambda's arity and PySpark's higher-order
    functions would pass the array index into it instead.
    """
    sh = shingles(text, shingle_k)

    def hash_fn(i: int):
        return lambda s: F.xxhash64(F.lit(i), s)

    sigs = [
        F.array_min(F.transform(sh, hash_fn(i))) for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_signatures_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(_id, sig_0..sig_{n-1}) MinHash signatures.

    Physical shape matters here: building the shingle array once and
    computing 16 per-array mins as separate array expressions re-evaluates
    the (expensive) shingle construction per hash — Catalyst does not CSE
    across independent ``transform`` lambdas (measured 16× blowup, ~2 min
    at sf0.1).  Instead: explode hashed shingles once → one
    hash-partitioned groupBy with 16 ``min(a_i*h + b_i)`` universal-hash
    aggregates over the single shingle hash.  Partial aggregation
    (map-side combine) means only 16 longs per doc shuffle — this is the
    shape that survives 100 TB."""
    # a small corpus parquet arrives as ONE input split; shingling is the
    # heavy per-row work, so spread docs across the cluster first.  Hash-
    # partitioning by id also pre-satisfies the groupBy's distribution, so
    # no second shuffle of the (much larger) exploded rows.  The partition
    # count is explicit because AQE would coalesce by pre-explode shuffle
    # bytes — tiny here — and put all the explode work back on one core.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    # hashed shingles (no shingle-string materialization); the token-hash
    # array is materialized in its OWN projection so the shingle lambda
    # reads a cheap attribute — inlining it would re-tokenize per shingle
    # (no CSE inside HOF lambdas; see functions/hashing).
    exploded = (
        df.repartition(n_parts, F.col(id_col))
        .select(
            F.col(id_col).alias("_id"),
            token_hashes(F.col(text_col)).alias("_tokh"),
        )
        .select(
            "_id",
            F.explode(
                shingle_hashes_from_token_hashes(F.col("_tokh"), shingle_k)
            ).alias("_sh"),
        )
    )
    # universal-hash family over the ONE shingle hash: h_i = a_i * h + b_i
    # in wrapping int64 (a_i odd => bijective mix) — 16 integer mixes, no
    # further string hashing.
    base = F.col("_sh")
    aggs = [
        F.min(
            base if i == 0
            else base * F.lit(2 * i * 0x9E3779B1 + 1) + F.lit(i * 0x85EBCA77)
        ).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy("_id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH: documents sharing one
    full band of the signature land in the same bucket.  Returns distinct
    (id_a, id_b) with id_a < id_b."""
    rows_per_band = num_hashes // bands
    with_sig = minhash_signatures_df(
        df, text_col, id_col, num_hashes, shingle_k
    )

    band_entries = band_entry_rows(
        with_sig, rows_per_band, range(bands), id_col="_id"
    )

    a = band_entries.alias("a")
    b = band_entries.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard_on_pairs(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification step)."""
    sh = (
        df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        )
        .select(
            F.col(id_col).alias("_jid"),
            token_hashes(F.col(text_col)).alias("_tokh"),
        )
        .select(
            "_jid",
            shingle_hashes_from_token_hashes(
                F.col("_tokh"), shingle_k
            ).alias("_sh"),
        )
    )
    out = (
        pairs.join(sh.withColumnRenamed("_jid", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_jid", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .drop("sh_a", "sh_b")
    )
    return out


# universal-hash mix constants per mode.  "fast" uses 64-bit wrapping
# golden-ratio mixes (Spark wraps; engine-local only).  "portable" keeps
# every intermediate below 2^59 so DuckDB's non-wrapping BIGINT arithmetic
# reproduces it exactly: 28-bit md5 base x 21-bit multiplier.
def _mix_constants(mode: str, i: int) -> tuple[int, int]:
    if mode == "fast":
        return (2 * i * 0x9E3779B1 + 1, i * 0x85EBCA77)
    return (2 * i * 48271 + 1, i * 1000003)


def portable_shingle_hashes_from_tokens(toks: Column, k: int = 3) -> Column:
    """28-bit md5-derived shingle hashes from a materialized token-array
    column — identical in DuckDB via
    CAST(concat('0x', substring(md5(s), 1, 7)) AS BIGINT).  Same
    attribute-only contract as ``shingles_from_tokens`` (no CSE inside HOF
    lambdas)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", F.slice(toks, i, k))), 1, 7
                ),
                16,
                10,
            ).cast("long"),
        )
    )


def portable_shingle_hashes(text: Column, k: int = 3) -> Column:
    """Inline convenience form of
    :func:`portable_shingle_hashes_from_tokens` (tests/small inputs only —
    re-tokenizes per shingle)."""
    return portable_shingle_hashes_from_tokens(tokens(text), k)


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.7,
    hash_mode: str = "fast",
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold.

    The shingle-hash arrays are computed ONCE and persisted — both the
    signature explode and the verification join read them; at corpus
    scale, shingling twice would double the dominant scan+tokenize cost.
    Cache lifetime: that persist is left to executor storage LRU
    eviction by design — the result is lazy, so an eager unpersist
    would fire before the caller's action.  A long-lived session
    looping over corpora should use :func:`minhash_dedup_batched`,
    which stages to ``work_dir`` parquet instead (review note, round 9).

    ``hash_mode="fast"`` (default) uses engine-native xxhash64 shingle
    hashing; ``"portable"`` uses md5-derived 28-bit hashes and
    overflow-free mixes so an ANSI-SQL engine reproduces the exact same
    candidate pairs and Jaccard values (the oracle-checked mode).
    """
    if hash_mode not in ("fast", "portable"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    # the shared (_jid, _sh) projection, behind an id-repartition: the
    # explode+groupBy below is then pre-distributed and shuffle-free
    sh_df = _shingle_frame(
        df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        ),
        text_col, id_col, shingle_k, hash_mode,
    ).persist()

    exploded = sh_df.select(
        F.col("_jid").alias("_id"), F.explode("_sh").alias("_shh")
    )
    aggs = [
        F.min(mixed_at(F.col("_shh"), i, hash_mode)).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    with_sig = exploded.groupBy("_id").agg(*aggs)

    rows_per_band = num_hashes // bands
    band_entries = band_entry_rows(
        with_sig, rows_per_band, range(bands), id_col="_id"
    )
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    out = (
        cand.join(
            sh_df.withColumnRenamed("_jid", "id_a").withColumnRenamed("_sh", "sh_a"),
            "id_a",
        )
        .join(
            sh_df.withColumnRenamed("_jid", "id_b").withColumnRenamed("_sh", "sh_b"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .drop("sh_a", "sh_b")
    )
    return out.where(F.col("jaccard") >= threshold)


def minhash_dedup_batched(
    df: DataFrame,
    work_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.7,
    hash_mode: str = "fast",
    band_batches: int | None = None,
    store_shingles: bool = True,
) -> DataFrame:
    """:func:`minhash_dedup` with BOUNDED peak state — the sharded
    discipline for corpora too large for one pass's shuffle footprint
    (single fat JVM, or a cluster where the full banding shuffle would
    spill every executor).

    Identical output (same signatures, same candidate bands, same
    verified Jaccard pairs — parity-tested in ``tests/test_dedup.py``);
    different execution schedule:

    1. shingle arrays + the 16 signature mins are computed ONCE and
       written to ``work_dir/sig`` parquet (the expensive scan+tokenize
       never re-runs);
    2. the LSH banding self-join runs in ``band_batches`` passes over
       that parquet, each pass reading ONLY its bands' signature
       columns (column pruning) and shuffling ``1/band_batches`` of
       the banding volume; per-batch candidate pairs append to
       ``work_dir/pairs``;
    3. verification joins the globally-distinct pair set back against
       the stored shingle arrays, exactly like the monolithic form.

    Peak candidate-generation state per pass is ``bands/band_batches``
    of the monolithic variant's (measured in ``docs/SCALE.md``), for
    one extra corpus-sized parquet write and ``band_batches`` metadata
    re-reads.  ``band_batches=None`` means one pass per band.

    ``band_batches`` may exceed ``bands`` (a multiple of it): each band
    then splits into ``band_batches/bands`` HASH SLICES of its
    band-hash space, filtered map-side BEFORE the self-join exchange —
    the ``span_dedup`` hash-slicing discipline.  Both sides of a
    matching pair share the band hash, so the slices partition each
    band's pair space exactly (identical output, parity-tested); the
    per-pass peak keeps dividing by ``band_batches`` past the band
    count, which is what lets a fixed executor budget absorb an
    arbitrarily large corpus (measured at 30 M docs in
    ``docs/SCALE.md``).  The slice hash is schedule-internal (never in
    the output), so it stays engine-native in both hash modes.

    ``store_shingles=False`` drops the per-shingle hash arrays from the
    persisted sig parquet (they are ~90 % of its bytes — the artifact
    shrinks ~10×, measured in ``docs/SCALE.md``) and instead recomputes
    shingles FROM THE SOURCE TEXT inside the verify step, for candidate
    ids only (a map-only re-scan of the corpus; the join exchanges
    still carry only candidate rows).  Output is bit-identical
    (parity-tested): `_shingle_frame` is the same arithmetic either
    way.  The trade: one extra corpus text scan per dedup run, in
    exchange for a signature artifact that scales as
    ``docs × num_hashes`` longs regardless of document length — the
    right default when the artifact is long-lived or disk-bound.
    A shingle-less work dir serves :func:`minhash_admit` only with a
    ``corpus_text=`` source (the state side recomputes shingles from it
    for candidate ids only) — the state meta records the mode and
    admission without one refuses loudly.
    """
    import os as _os

    if hash_mode not in ("fast", "portable"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    if num_hashes % bands:
        raise ValueError(f"bands {bands} must divide num_hashes {num_hashes}")
    nb = band_batches if band_batches is not None else bands
    if nb < 1 or (nb > bands and nb % bands):
        raise ValueError(
            f"band_batches must be in [1, {bands}] or a multiple of "
            f"bands={bands}, got {nb}"
        )
    spark = df.sparkSession
    sig_path = _os.path.join(work_dir, "sig")
    # one corpus pass: shingle arrays AND all signature mins land in a
    # single parquet — later passes column-prune what they need (a
    # banding pass reads rows_per_band longs/doc, never the arrays).
    # NO repartition: signatures here are row-local array_min folds (the
    # monolithic form's id-repartition exists only to make its
    # explode+groupBy shuffle-free), so the text never crosses an
    # exchange at all — the corpus streams scan->compute->write.
    sig_frame = _signature_frame(
        df, text_col, id_col, num_hashes, shingle_k, hash_mode
    )
    if not store_shingles:
        sig_frame = sig_frame.drop("_sh")
    sig_frame.write.mode("overwrite").parquet(sig_path)
    _write_state_meta(
        spark, work_dir, num_hashes, bands, shingle_k, hash_mode,
        store_shingles=store_shingles,
    )

    rows_per_band = num_hashes // bands
    pairs_path = _os.path.join(work_dir, "pairs")
    if nb <= bands:
        # round-robin band groups (even batch sizes for ragged bands/nb)
        batches = [(list(range(bands))[i::nb], None) for i in range(nb)]
        n_slices = 1
    else:
        # sub-band hash slicing: one pass per (band, slice of its
        # band-hash space) — per-pass exchange = rows/n_slices
        n_slices = nb // bands
        batches = [
            ([b], s) for b in range(bands) for s in range(n_slices)
        ]
    for bi, (batch, slice_id) in enumerate(batches):
        sig_cols = sorted(
            {
                f"sig_{b * rows_per_band + r}"
                for b in batch
                for r in range(rows_per_band)
            },
            key=lambda c: int(c.split("_")[1]),
        )
        # NULL-text docs carry all-NULL sigs here AND in the monolithic
        # form (its shingle array is [NULL], min(NULL)=NULL), so both
        # variants band them together on md5("") and verify them at
        # jaccard 1.0 — "no text" pairs with "no text".  Deliberately
        # NOT filtered: parity with minhash_dedup is the contract
        # (tests/test_scale_ops.py::test_minhash_batched_null_text_parity);
        # drop null texts upstream if that pairing is unwanted.
        sig = spark.read.parquet(sig_path).select("_jid", *sig_cols)
        band_entries = band_entry_rows(sig, rows_per_band, batch)
        if slice_id is not None:
            # filter map-side, BEFORE the exchange: only this slice's
            # entries cross it.  band_hash is never null (concat_ws
            # skips null sigs -> md5("")), so null-text docs all land
            # in md5("")'s slice together — the null-parity contract
            # above survives slicing.
            band_entries = band_entries.where(
                F.pmod(F.xxhash64(F.col("band_hash")), F.lit(n_slices))
                == slice_id
            )
        a = band_entries.alias("a")
        b_ = band_entries.alias("b")
        (
            a.join(
                b_,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(
                F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
            )
            .distinct()
            .write.mode("overwrite" if bi == 0 else "append")
            .parquet(pairs_path)
        )
        # reclaim the finished pass's shuffle files NOW: Spark frees
        # them only when the driver GCs the pass's ShuffleDependency
        # (ContextCleaner), and its fallback periodic GC fires every
        # 30 min — at 100 M docs the passes otherwise accumulate tens
        # of GB of dead shuffle files and ENOSPC the host (measured,
        # round 10).  One driver GC per pass costs ms against a
        # minutes-long pass, and on a real cluster the same cleaner
        # RPC removes executor-side files — this is the bounded-DISK
        # half of the bounded-state schedule.
        spark.sparkContext._jvm.System.gc()

    cand = spark.read.parquet(pairs_path).distinct()
    # candidate-id semi-filter BEFORE the verification joins: joining
    # the full shingle table shuffles corpus-sized arrays (measured
    # 476 MB at 1 M docs — the run's biggest exchange); the broadcast
    # (or hash-sliced, see _candidate_semi_join) semi-join streams the
    # table in place and the verify exchanges then carry only
    # candidate rows (∝ pairs, not corpus).  The id count is EXACT —
    # the loose 2×pairs bound declined the broadcast at 100 M docs
    # and the sort-merge fallback exchanged the whole corpus (ENOSPC,
    # round 10).
    cand_ids = (
        cand.select(F.col("id_a").alias("_vid"))
        .unionByName(cand.select(F.col("id_b").alias("_vid")))
        .distinct()
    )
    cand_ids_path = _os.path.join(work_dir, "_cand_ids")
    cand_ids.write.mode("overwrite").parquet(cand_ids_path)
    cand_ids = spark.read.parquet(cand_ids_path)
    n_ids = cand_ids.count()  # footer-only
    sh_src = (
        spark.read.parquet(sig_path).select("_jid", "_sh")
        if store_shingles
        # recompute from text for candidate rows only: the semi-join
        # filter applies map-side against the broadcast id set, so the
        # re-scan is exchange-free and only candidate shingle arrays
        # ever materialize past it
        else _shingle_frame(df, text_col, id_col, shingle_k, hash_mode)
    )
    sh_df = _candidate_semi_join(sh_src, cand_ids, n_ids, "_jid")
    out = (
        cand.join(
            sh_df.withColumnRenamed("_jid", "id_a").withColumnRenamed(
                "_sh", "sh_a"
            ),
            "id_a",
        )
        .join(
            sh_df.withColumnRenamed("_jid", "id_b").withColumnRenamed(
                "_sh", "sh_b"
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .drop("sh_a", "sh_b")
    )
    return out.where(F.col("jaccard") >= threshold)


def mixed_at(h: Column, i: int, hash_mode: str) -> Column:
    """The i-th universal-hash mix of one shingle hash (shared by the
    monolithic groupBy-min signatures and the batched array_min form —
    same constants, same arithmetic, same overflow behavior)."""
    a, b = _mix_constants(hash_mode, i)
    return h if i == 0 else h * F.lit(a) + F.lit(b)


def _shingle_frame(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int,
    hash_mode: str,
) -> DataFrame:
    """``(_jid, _sh)``: materialize the token(-hash) array, THEN build
    shingle hashes from the attribute — inlining re-tokenizes per
    shingle because Catalyst has no CSE inside HOF lambdas (measured 6×
    on this pipeline at sf0.1; see functions/hashing).  Shared by every
    MinHash variant so the shingle arithmetic cannot drift."""
    if hash_mode == "fast":
        tok_expr = token_hashes(F.col(text_col))
        sh_expr = shingle_hashes_from_token_hashes(F.col("_tok"), shingle_k)
    else:
        tok_expr = tokens(F.col(text_col))
        sh_expr = portable_shingle_hashes_from_tokens(F.col("_tok"), shingle_k)
    return df.select(
        F.col(id_col).alias("_jid"), tok_expr.alias("_tok")
    ).select("_jid", sh_expr.alias("_sh"))


def _signature_frame(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int,
    shingle_k: int, hash_mode: str,
) -> DataFrame:
    """``(_jid, _sh, sig_0..sig_{n-1})`` via row-local ``array_min``
    folds — the stored-state signature projection shared by the batched
    schedule and admission (bit-identical arithmetic across variants is
    their parity contract)."""
    return _shingle_frame(df, text_col, id_col, shingle_k, hash_mode).select(
        "_jid",
        "_sh",
        *[
            # single-parameter lambda only: F.transform dispatches a
            # two-parameter callable as (element, index).  It builds the
            # expression eagerly, so the loop variable binds correctly.
            F.array_min(
                F.transform("_sh", lambda h: mixed_at(h, i, hash_mode))
            ).alias(f"sig_{i}")
            for i in range(num_hashes)
        ],
    )


def band_entry_rows(
    sig: DataFrame, rows_per_band: int, band_ids, id_col: str = "_jid"
) -> DataFrame:
    """``(_id, band_id, band_hash)`` — THE banding explode, shared
    verbatim by the monolithic, batched, and admission variants: the
    md5-of-concat band key must stay bit-identical across variants or
    their parity contracts (batched ≡ monolithic, admission ≡ the
    monolithic pairs restricted to the delta) silently break."""
    return sig.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"sig_{b * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in band_ids
                ]
            )
        ).alias("band"),
    ).select("_id", "band.band_id", "band.band_hash")


def _write_state_meta(
    spark, work_dir: str, num_hashes: int, bands: int, shingle_k: int,
    hash_mode: str, store_shingles: bool = True,
) -> None:
    """Record the knobs BAKED into a stored signature state (threshold
    is query-time and deliberately excluded).  Admission validates
    against this: signatures built with different hashing knobs are
    silently incomparable — mismatched admission would return plausible
    but WRONG pairs with no error.  ``store_shingles`` records whether
    the sig parquet carries the ``_sh`` arrays admission's verify step
    needs."""
    import json as _json
    import posixpath as _pp

    from qualityassurancetool_spark.functions.fs import write_text

    write_text(
        spark,
        _pp.join(work_dir, "minhash_meta.json"),
        _json.dumps(
            {
                "num_hashes": num_hashes,
                "bands": bands,
                "shingle_k": shingle_k,
                "hash_mode": hash_mode,
                "store_shingles": store_shingles,
            }
        ),
    )


def _check_state_meta(
    spark, state_dir: str, num_hashes: int, bands: int, shingle_k: int,
    hash_mode: str,
) -> dict | None:
    """Validate the passed knobs against the state's baked ones.
    Returns the stored meta dict (truthy) when a meta file existed,
    else ``None`` — a bootstrapping caller writes one on falsy, so no
    state stays unenforced.  ``store_shingles`` in the returned dict
    tells admission whether the sig parquet carries ``_sh`` arrays or
    the caller must supply ``corpus_text=`` for recompute."""
    import json as _json
    import posixpath as _pp

    from qualityassurancetool_spark.functions.fs import (
        path_exists,
        read_text,
    )

    meta_path = _pp.join(state_dir, "minhash_meta.json")
    if not path_exists(spark, meta_path):
        # pre-metadata state: caller keeps the same-knobs contract
        return None
    stored = _json.loads(read_text(spark, meta_path))
    mine = {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_k": shingle_k,
        "hash_mode": hash_mode,
    }
    diff = {
        k: (stored.get(k), v) for k, v in mine.items() if stored.get(k) != v
    }
    if diff:
        raise ValueError(
            "minhash state knob mismatch (stored vs passed): "
            + ", ".join(
                f"{k}={s!r} vs {v!r}" for k, (s, v) in sorted(diff.items())
            )
            + f" — signatures in {state_dir!r} were baked with the stored "
            "knobs and are not comparable under different ones"
        )
    return stored


# ~160 MB through the driver: comfortably broadcastable.  Past it, an
# explicit broadcast hint would ship the frame through the driver
# unconditionally (the hint BYPASSES autoBroadcastJoinThreshold) and OOM
# at exactly the boilerplate-heavy-corpus scale these functions target.
# Sized in BYTES, not rows: an 8-byte long-id frame and a ~60-byte band-
# entry frame have very different safe row counts, and one shared row
# limit sized for ids would permit a multi-GB entry broadcast (review
# finding, round 8).
_BROADCAST_BYTES_LIMIT = 160 * 1024 * 1024


def _candidate_semi_join(
    frame: DataFrame, cand_ids: DataFrame, n_ids: int, id_col: str
) -> DataFrame:
    """Semi-filter a CORPUS-SIZED frame down to candidate rows without
    ever shuffling the corpus side.

    The un-hinted fallback of a declined broadcast is a sort-merge
    semi-join that exchanges the whole left side — at 100 M docs that
    is ~50 GB of shingle arrays for a few MB of candidate ids, and it
    ENOSPC'd the round-10 rehearsal (the broadcast gate's loose
    2×pairs-rows bound declined while the TRUE distinct-id frame was
    64 MB).  Callers therefore pass the EXACT id count; when even that
    exceeds the broadcast budget, the ids split into hash slices that
    each fit, and the corpus side is re-scanned once per slice with a
    MAP-SIDE ``pmod(xxhash64(id))`` filter — each id lives in exactly
    one slice, so the union of slice semi-joins is the exact
    semi-join.  S extra map-only corpus scans (S = ids ÷ budget, 2-3
    at 10^9 docs) buy ZERO corpus-sized exchanges — the ``band_batches``
    discipline applied to the verify step.

    Id bytes are measured, not assumed: crawl corpora commonly key on
    string URLs (~100 B), and an 8-bytes-per-id guess would
    force-broadcast a multi-GB id set (review finding, round 10).  The
    one cheap agg over the (already materialized, candidate-sized) id
    frame prices each id as its octet length + 48 B of hashed-relation
    overhead — JVM ``UnsafeHashedRelation`` rows for UTF8String keys
    cost ~40-60 B each beyond the payload (row header + offsets + hash
    map slots), and the unconditional broadcast hint below BYPASSES
    autoBroadcastJoinThreshold, so under-pricing a slice risks a driver
    OOM while over-pricing merely costs one more map-only corpus scan
    (review finding, round 11).  Long-keyed frames use Spark's compact
    ``LongHashedRelation`` and are priced at 24 B/row."""
    from pyspark.sql import types as T

    id_field = next(f for f in cand_ids.schema.fields if f.name == "_vid")
    if isinstance(
        id_field.dataType,
        (T.StringType, T.BinaryType),
    ):
        row = cand_ids.agg(
            F.sum(F.octet_length(F.col("_vid"))).alias("b")
        ).collect()[0]
        id_bytes = int(row["b"] or 0) + 48 * int(n_ids)
    else:
        id_bytes = 24 * int(n_ids)
    n_slices = max(
        1, -(-id_bytes // _BROADCAST_BYTES_LIMIT)  # ceil div
    )
    if n_slices == 1:
        return frame.join(
            F.broadcast(cand_ids),
            F.col(id_col) == F.col("_vid"),
            "left_semi",
        )
    out = None
    for s in range(n_slices):
        part = frame.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_slices)) == s
        ).join(
            F.broadcast(
                cand_ids.where(
                    F.pmod(F.xxhash64(F.col("_vid")), F.lit(n_slices))
                    == s
                )
            ),
            F.col(id_col) == F.col("_vid"),
            "left_semi",
        )
        out = part if out is None else out.unionByName(part)
    return out


def minhash_admit(
    delta: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.7,
    hash_mode: str = "fast",
    update_state: bool = True,
    delta_sig_path: str | None = None,
    extra_state_paths: list[str] | None = None,
    admission_id: str | None = None,
    corpus_text: DataFrame | str | None = None,
) -> DataFrame:
    """Incremental near-dup ADMISSION: verify a (small) delta of new
    documents against an existing corpus state at cost ∝ delta — the
    daily-crawl discipline (`plans/incremental` applied to MinHash).

    ``state_dir`` is a :func:`minhash_dedup_batched` work dir (its
    ``sig`` parquet holds every admitted doc's shingle array + signature
    mins); bootstrap one with ``minhash_dedup_batched(corpus,
    state_dir, ...)``.  The same hashing knobs MUST be passed — they
    are baked into the stored signatures, and the work dir's
    ``minhash_meta.json`` enforces it (mismatch raises instead of
    returning plausible-but-wrong pairs).

    Retry semantics: plain ``update_state`` APPENDS — a caller retry
    after a mid-run failure double-appends the delta (duplicate state
    rows ⇒ duplicate future pairs).  Cron-scripted daily admissions
    pass ``admission_id=`` (e.g. the crawl date): the delta's
    signatures then land in an OVERWRITE slice
    ``sig_admissions/admission=<id>/`` and the pairs in
    ``pairs_admissions/admission=<id>/`` — re-running the same id
    replaces its own output byte-for-byte instead of appending (the
    ``streaming/minhash_stream`` per-batch slice discipline applied to
    the batch path; reference anchor: the reference's idempotent
    re-run contract, ``src/main.py:366-395``).  Retry the SAME id
    before starting the next admission — a later admission legitimately
    sees this one's slice as state.  Every admission (either mode)
    automatically unions all existing ``sig_admissions`` slices into
    its state side.

    Execution shape — the corpus state never shuffles:

    1. the delta's signatures are computed in one exchange-free pass
       (same arithmetic as the stored ones);
    2. the delta's (band_id, band_hash) entries — ∝ delta — are
       BROADCAST against a scan of the stored signatures, so candidate
       generation reads the state once and moves only matches;
    3. verification joins candidate-sized slices of the shingle
       arrays, exactly like the batched verifier.

    Returns verified pairs where AT LEAST ONE side is a delta doc
    (delta-vs-corpus and delta-vs-delta; duplicate ids across
    state/delta are the caller's contract, as in ``ivfadc_append``).
    With ``update_state`` the delta's signatures are appended to the
    state afterwards, so the NEXT admission sees these docs.  The
    returned frame is backed by versioned scratch inside ``state_dir``
    (pairs parquet when ``update_state``, delta sig+candidate parquet
    when frozen) that the NEXT admission on the same state deletes:
    consume (or copy) it before admitting again — a later read fails
    loudly rather than silently returning the newer admission's pairs.
    Output
    equals the monolithic pipeline's pairs over (corpus ∪ delta)
    restricted to pairs touching the delta — parity-tested in
    ``tests/test_scale_ops.py`` and oracle-checked as
    ``x_minhash_admit``.

    Streaming/slice knobs (used by
    :func:`streaming.minhash_stream.streaming_minhash_admit`):
    ``delta_sig_path`` overrides where the delta signatures land (the
    streaming twin writes one slice per micro-batch, overwritten on
    retry = idempotent); ``extra_state_paths`` unions additional sig
    parquet dirs into the state side (previous batch slices).  A
    missing ``state_dir/sig`` is allowed — admission then sees only the
    extra slices (or nothing: a cold stream's first batch verifies
    delta-vs-delta only).

    Slim states (``minhash_dedup_batched(store_shingles=False)`` — the
    only configuration whose signature artifact fits a 100 M-doc corpus
    on a real disk budget) admit with ``corpus_text=``: a DataFrame (or
    parquet path) carrying the ORIGINAL corpus's (``id_col``,
    ``text_col``), from which the state side's shingles are recomputed
    for candidate ids only — a map-only corpus re-scan behind the same
    ``_candidate_semi_join`` discipline the batched verify uses, so
    nothing corpus-sized ever crosses an exchange.  ``corpus_text``
    must cover every doc in the slim ``sig`` parquet (a candidate id
    with no shingle source raises instead of silently dropping its
    pairs).  Admission SLICES keep their own ``_sh`` arrays (disk ∝
    admitted deltas, and their docs are not in ``corpus_text``), so
    slim-state admissions require ``admission_id=`` (or
    ``update_state=False``) — a plain append into the slim ``sig``
    parquet would fork its schema.  Slim-vs-full admission parity is
    byte-identical (``tests/test_scale_ops.py``)."""
    import os as _os

    if hash_mode not in ("fast", "portable"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    if num_hashes % bands:
        raise ValueError(f"bands {bands} must divide num_hashes {num_hashes}")
    spark = delta.sparkSession
    from qualityassurancetool_spark.functions.fs import (
        delete_path,
        list_subdirs,
        path_exists,
    )

    meta = _check_state_meta(
        spark, state_dir, num_hashes, bands, shingle_k, hash_mode
    )
    had_meta = meta is not None
    slim_state = bool(meta) and not meta.get("store_shingles", True)
    corpus_df = (
        spark.read.parquet(corpus_text)
        if isinstance(corpus_text, str)
        else corpus_text
    )
    if slim_state:
        if corpus_df is None:
            raise ValueError(
                f"minhash state {state_dir!r} was built with "
                "store_shingles=False: its sig parquet has no _sh "
                "arrays, so admission's verify step needs the original "
                "corpus text to recompute them — pass corpus_text= "
                "(a DataFrame or parquet path with the corpus's "
                f"({id_col!r}, {text_col!r}) columns).  Candidate "
                "shingles are recomputed map-side for candidate ids "
                "only; the corpus never shuffles."
            )
        if update_state and admission_id is None:
            raise ValueError(
                "slim minhash state: plain update_state=True would "
                "append full-schema rows into the shingle-less sig "
                "parquet (schema fork).  Pass admission_id=<id> — the "
                "delta's signatures land in their own overwrite slice, "
                "_sh arrays included (disk cost ∝ delta) — or "
                "update_state=False for a frozen dry run."
            )
    sig_path = _os.path.join(state_dir, "sig")
    adm_root = _os.path.join(state_dir, "sig_admissions")
    own_slice = None
    if admission_id is not None:
        import re as _re

        # YAML-ish callers (the CLI) hand dates as datetime.date —
        # their ISO str form is exactly the intended slice name
        admission_id = str(admission_id)
        if not _re.fullmatch(r"[A-Za-z0-9._-]+", admission_id) or (
            admission_id.endswith(
                ("_cand", "_cand_ids", "_cand_sh", "_cand_passes")
            )
        ):
            raise ValueError(
                f"admission_id {admission_id!r} must be "
                "[A-Za-z0-9._-]+ and not end with "
                "'_cand'/'_cand_ids'/'_cand_sh'/'_cand_passes' "
                "(those suffixes name candidate scratch)"
            )
        if delta_sig_path is not None:
            raise ValueError(
                "admission_id and delta_sig_path are mutually exclusive "
                "(admission_id derives the slice path)"
            )
        if not update_state:
            raise ValueError(
                "admission_id implies update_state=True (the overwrite "
                "slice IS the state update); use update_state=False "
                "without it for a frozen dry run"
            )
        own_slice = f"admission={admission_id}"
        delta_sig_path = _os.path.join(adm_root, own_slice)
    # every admission sees all previously committed admission slices as
    # state (its own excluded: the delta side already carries it, and a
    # RETRY must see the same existing set it saw the first time)
    adm_slices = [
        _os.path.join(adm_root, d)
        for d in sorted(list_subdirs(spark, adm_root, prefix="admission="))
        # "_cand"/"_cand_ids"/"_cand_sh"/"_cand_passes" SUFFIXES are
        # candidate scratch
        # a crashed admission may leave behind — never signature
        # slices.  Suffix match only: an id merely CONTAINING "_cand"
        # (legal pre-round-10) must keep counting as state (review
        # finding, round 10)
        if not d.endswith(
            ("_cand", "_cand_ids", "_cand_sh", "_cand_passes")
        )
        and d != own_slice
    ]
    extra_state_paths = adm_slices + list(extra_state_paths or [])
    internal_scratch = delta_sig_path is None
    stale_delta_versions: list[str] = []
    if delta_sig_path is None:
        # versioned internal scratch (same discipline as the pairs dir):
        # a frame returned by a previous update_state=False admission
        # reads ITS version's sig+cand files — writing over one shared
        # path would silently feed it the newer delta's data.  The
        # previous versions are deleted only after this call's scratch
        # is fully written, so the previous frame stays valid until the
        # next admission, then fails loudly (review finding, round 8).
        delta_root = _os.path.join(state_dir, "_delta_sig")
        dvs = [
            int(n.split("=", 1)[1])
            for n in list_subdirs(spark, delta_root, prefix="v=")
            if n.split("=", 1)[1].isdigit()
        ]
        dk = max(dvs, default=-1) + 1
        delta_sig_path = _os.path.join(delta_root, f"v={dk}")
        stale_delta_versions = [
            _os.path.join(delta_root, f"v={v}") for v in dvs
        ]
    _signature_frame(
        delta, text_col, id_col, num_hashes, shingle_k, hash_mode
    ).write.mode("overwrite").parquet(delta_sig_path)

    rows_per_band = num_hashes // bands

    sig_cols = ["_jid"] + [f"sig_{i}" for i in range(num_hashes)]
    # Hadoop-FS existence check, NOT os.path: a remote state_dir
    # (hdfs://, s3a://) would otherwise read as missing and silently
    # degrade admission to delta-vs-delta pairs (review finding)
    state_paths = (
        [sig_path] if path_exists(spark, sig_path) else []
    ) + list(extra_state_paths or [])

    def union_sigs(cols: list[str]) -> DataFrame:
        frames = [
            spark.read.parquet(p).select(*cols) for p in state_paths
        ] + [spark.read.parquet(delta_sig_path).select(*cols)]
        out_f = frames[0]
        for f in frames[1:]:
            out_f = out_f.unionByName(f)
        return out_f

    # broadcast the delta side: the state scans ONCE, nothing
    # corpus-sized crosses an exchange; a < b plus the union on the big
    # side yields both delta-vs-corpus and delta-vs-delta pairs exactly
    # once (a corpus-vs-corpus pair has no delta entry to match).
    # Size-gated BY BYTES: delta entry rows = delta docs × bands, known
    # from the delta sig parquet footers, and an entry row is ~64 B
    # (id + int band_id + 32-char md5 + struct overhead).  An oversized
    # delta must NOT degrade to the AQE-chosen join: a declined
    # broadcast sort-merges the CORPUS-SIDE band entries — docs × bands
    # rows of 32-char hashes through an exchange, which ENOSPC'd the
    # round-11 100 M-doc rehearsal at delta = 1 M docs.  Instead the
    # bands split into passes whose delta entries each fit the budget
    # (the band_batches discipline applied to admission's candidate
    # join): per pass, the state scan is column-pruned to that pass's
    # sig columns, so B passes together still read the sig parquet
    # ~once, and the only exchanges are pass-pair-sized distincts.  A
    # delta so large even ONE band exceeds the budget additionally
    # hash-slices the delta ids within the pass (S more map-only state
    # scans, still zero corpus-sized exchanges).
    n_delta = spark.read.parquet(delta_sig_path).count()
    # entry bytes are MEASURED, not assumed (the _candidate_semi_join
    # discipline): crawl deltas commonly key on string URLs (~100 B),
    # and a fixed per-row guess would under-price their band entries —
    # the unconditional broadcast hint below bypasses
    # autoBroadcastJoinThreshold, so under-pricing risks a driver OOM.
    # One cheap delta-sized agg: avg id octets + 4 B band_id + 32-char
    # md5 + ~48 B hashed-relation overhead per entry row.
    if n_delta:
        avg_id_bytes = float(
            spark.read.parquet(delta_sig_path)
            .agg(
                F.avg(
                    F.octet_length(F.col("_jid").cast("string"))
                ).alias("b")
            )
            .collect()[0]["b"]
            or 8.0
        )
    else:
        avg_id_bytes = 8.0
    entry_bytes = int(avg_id_bytes) + 4 + 32 + 48

    def _cand_pairs(band_ids, delta_slice=None):
        dsig = spark.read.parquet(delta_sig_path).select(*sig_cols)
        if delta_slice is not None:
            s, n_slices = delta_slice
            dsig = dsig.where(
                F.pmod(F.xxhash64(F.col("_jid")), F.lit(n_slices))
                == F.lit(s)
            )
        d_e = band_entry_rows(dsig, rows_per_band, band_ids)
        a = band_entry_rows(
            union_sigs(sig_cols), rows_per_band, band_ids
        ).alias("a")
        # ALWAYS hinted: every call is pass/slice-sized under the
        # budget by construction, and an un-hinted fallback would be
        # the corpus-side sort-merge this schedule exists to outlaw
        d = F.broadcast(d_e).alias("d")
        return (
            a.join(
                d,
                (F.col("a.band_id") == F.col("d.band_id"))
                & (F.col("a.band_hash") == F.col("d.band_hash"))
                & (F.col("a._id") != F.col("d._id")),
            )
            .select(
                F.least(F.col("a._id"), F.col("d._id")).alias("id_a"),
                F.greatest(F.col("a._id"), F.col("d._id")).alias("id_b"),
            )
            .distinct()
        )

    # materialize the candidates: (a) the verify step references them
    # three times — a parquet read beats relying on ReusedExchange;
    # (b) the footer count gates the cand-id broadcast.  The path is
    # deterministic per delta slice, so a streaming retry overwrites.
    cand_path = delta_sig_path.rstrip("/") + "_cand"
    if n_delta * bands * entry_bytes <= _BROADCAST_BYTES_LIMIT:
        # the common case: one pass, all bands, delta fully broadcast
        _cand_pairs(range(bands)).write.mode("overwrite").parquet(
            cand_path
        )
    else:
        per_band = max(n_delta * entry_bytes, 1)
        bands_per_pass = max(1, _BROADCAST_BYTES_LIMIT // per_band)
        slices = -(-per_band // _BROADCAST_BYTES_LIMIT)  # ceil
        scratch = cand_path + "_passes"
        delete_path(spark, scratch)
        part = 0
        for lo in range(0, bands, bands_per_pass):
            band_ids = range(lo, min(lo + bands_per_pass, bands))
            for s in range(slices):
                _cand_pairs(
                    band_ids,
                    delta_slice=(s, slices) if slices > 1 else None,
                ).write.mode("overwrite").parquet(
                    _os.path.join(scratch, f"part={part}")
                )
                part += 1
                # per-pass driver GC: same dead-shuffle-file discipline
                # as the batched build (round-10 finding)
                spark.sparkContext._jvm.System.gc()
        # select the pair columns FIRST: the part=k scratch dirs read
        # back as an inferred partition column, and a bare distinct()
        # over it would keep one row per (pair, pass)
        spark.read.parquet(scratch).select(
            "id_a", "id_b"
        ).distinct().write.mode("overwrite").parquet(cand_path)
        delete_path(spark, scratch)
    cand = spark.read.parquet(cand_path)
    # this call's scratch is fully written: previous admissions' delta
    # versions (and their cand siblings) are dead now — delete them so
    # scratch never accumulates (a stale frozen frame dies loudly here
    # instead of silently reading the new delta)
    for stale in stale_delta_versions:
        delete_path(spark, stale)
        delete_path(spark, stale + "_cand")
        delete_path(spark, stale + "_cand_ids")
        delete_path(spark, stale + "_cand_sh")
        delete_path(spark, stale + "_cand_passes")
    cand_ids = (
        cand.select(F.col("id_a").alias("_vid"))
        .unionByName(cand.select(F.col("id_b").alias("_vid")))
        .distinct()
    )
    cand_ids_path = cand_path + "_ids"
    cand_ids.write.mode("overwrite").parquet(cand_ids_path)
    cand_ids = spark.read.parquet(cand_ids_path)
    n_ids = cand_ids.count()  # footer-only, exact
    if slim_state:
        # the slim base sig parquet has no _sh arrays: recompute them
        # FROM THE CORPUS TEXT for candidate ids only — the semi-join
        # filter applies map-side against the (possibly sliced)
        # broadcast id set, so the re-scan is exchange-free and only
        # candidate shingle arrays materialize past it (exactly the
        # batched verify's store_shingles=False path).  Admission
        # slices and the delta carry their own _sh.
        sh_src = _shingle_frame(
            corpus_df, text_col, id_col, shingle_k, hash_mode
        )
        for p in extra_state_paths or []:
            sh_src = sh_src.unionByName(
                spark.read.parquet(p).select("_jid", "_sh")
            )
        sh_src = sh_src.unionByName(
            spark.read.parquet(delta_sig_path).select("_jid", "_sh")
        )
        # corpus_text may legitimately be a superset (e.g. the user's
        # full current corpus, overlapping delta/slice docs) — dedupe
        # on id over the CANDIDATE-sized survivors (bounded exchange)
        sh_all = _candidate_semi_join(
            sh_src, cand_ids, n_ids, "_jid"
        ).dropDuplicates(["_jid"])
        # materialize once: the verify joins reference sh_all twice and
        # would otherwise re-scan + re-tokenize the corpus per
        # reference; the footer count also feeds the coverage guard
        sh_scratch = cand_path + "_sh"
        sh_all.write.mode("overwrite").parquet(sh_scratch)
        sh_all = spark.read.parquet(sh_scratch)
        n_sh = sh_all.count()  # footer-only
        if n_sh < n_ids:
            raise ValueError(
                f"corpus_text does not cover the slim minhash state: "
                f"{n_ids - n_sh} of {n_ids} candidate ids have no "
                "shingle source (not in corpus_text, any admission "
                "slice, or the delta).  corpus_text must carry every "
                f"doc the state's sig parquet was built from "
                f"({state_dir!r}) — dropping them would silently lose "
                "their pairs."
            )
    else:
        sh_all = _candidate_semi_join(
            union_sigs(["_jid", "_sh"]), cand_ids, n_ids, "_jid"
        )
    out = (
        cand.join(
            sh_all.withColumnRenamed("_jid", "id_a").withColumnRenamed(
                "_sh", "sh_a"
            ),
            "id_a",
        )
        .join(
            sh_all.withColumnRenamed("_jid", "id_b").withColumnRenamed(
                "_sh", "sh_b"
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .drop("sh_a", "sh_b")
        .where(F.col("jaccard") >= threshold)
    )
    if admission_id is not None:
        # retry-idempotent commit: pairs overwrite their own slice, the
        # signature slice (already overwrite-written above) IS the
        # state update — no append anywhere, so a crashed-and-retried
        # admission converges to byte-identical state + pairs
        pairs_path = _os.path.join(
            state_dir, "pairs_admissions", own_slice
        )
        out.write.mode("overwrite").parquet(pairs_path)
        if not had_meta:
            _write_state_meta(
                spark, state_dir, num_hashes, bands, shingle_k, hash_mode
            )
        delete_path(spark, cand_path)
        delete_path(spark, cand_path + "_ids")
        delete_path(spark, cand_path + "_sh")
        delete_path(spark, cand_path + "_passes")
        return spark.read.parquet(pairs_path)
    if update_state:
        # the returned frame reads _delta_sig lazily, so materialize the
        # pairs BEFORE folding the delta into the state (parquet append
        # into sig/ is safe — _delta_sig is the fragile input).  Pairs
        # land in a fresh VERSIONED dir and the previous version is
        # deleted only now: an earlier admission's returned frame stays
        # valid until the next admission on this state, then fails
        # LOUDLY on the deleted path instead of silently aliasing the
        # newer pairs (review finding, round 8).
        pairs_root = _os.path.join(state_dir, "_admit_pairs")
        versions = [
            int(d.split("=", 1)[1])
            for d in list_subdirs(spark, pairs_root, prefix="v=")
            if d.split("=", 1)[1].isdigit()
        ]
        k = max(versions, default=-1) + 1
        pairs_path = _os.path.join(pairs_root, f"v={k}")
        out.write.mode("overwrite").parquet(pairs_path)
        spark.read.parquet(delta_sig_path).write.mode("append").parquet(
            sig_path
        )
        if not had_meta:
            # bootstrap: freeze this admission's knobs into the state so
            # the NEXT admission can't silently band incomparable
            # signatures together (review finding, round 8)
            _write_state_meta(
                spark, state_dir, num_hashes, bands, shingle_k, hash_mode
            )
        # scratch cleanup: the delta sigs are folded into sig/ and the
        # candidates are baked into the pairs parquet — without it a
        # long-running admitter accumulates one dead dir per call
        for v in versions:
            delete_path(spark, _os.path.join(pairs_root, f"v={v}"))
        delete_path(spark, cand_path)
        delete_path(spark, cand_path + "_ids")
        delete_path(spark, cand_path + "_passes")
        if internal_scratch:
            delete_path(spark, delta_sig_path)
        return spark.read.parquet(pairs_path)
    return out


# ---------------------------------------------------------------- simhash

def simhash_token_hashes(text: Column) -> Column:
    """The salted md5 token-hash array SimHash consumes.  Materialize this
    in its OWN projection and feed the attribute to
    :func:`simhash_from_token_hashes` — the per-bit aggregates reference
    the array ``bits`` times, and Catalyst has no CSE inside HOF lambdas
    (inlined, the md5 pass would run once per bit)."""
    tok = F.array_distinct(tokens(text))
    return F.transform(tok, lambda t: md5_long(t, salt="sh:"))


def simhash_from_token_hashes(hashes: Column, bits: int = 32) -> Column:
    """SimHash from a materialized token-hash array column: bit b is set
    iff the sum over tokens of ±1 (sign of token-hash bit b) is positive.
    Row-local array exprs; attribute-only contract (see above).

    ONE sequential fold accumulates all ``bits`` counters at once (the
    two-parameter transform lambda receives (element, index)); the
    previous form ran ``bits`` independent aggregates, each traversing
    the token array — 32 full passes per document (round-10 profile:
    the whole cost of the simhash gate queries).  Integer counts in the
    same per-token order make the fingerprint bit-identical; NULL
    token arrays still fingerprint to 0 (the no-text convention) via
    the final coalesce."""
    # the SQL shiftright/shiftleft take a column shift amount; the
    # PySpark wrappers only accept a Python int — call through the SQL
    # registry for the index-dependent shifts
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.transform(
            acc,
            lambda c, i: c
            + F.when(
                F.call_function(
                    "shiftright", h, i.cast("int")
                ).bitwiseAND(F.lit(1))
                == 1,
                1,
            ).otherwise(-1),
        ),
    )
    packed = F.aggregate(
        F.transform(
            counts,
            lambda c, i: F.when(
                c > 0,
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), i.cast("int")
                ),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.coalesce(packed, F.lit(0).cast("long"))


def simhash(text: Column, bits: int = 32) -> Column:
    """Inline convenience form (tests/small inputs only — re-hashes the
    token array once per bit; hot paths use the two-step form)."""
    return simhash_from_token_hashes(simhash_token_hashes(text), bits)


def hamming_distance(a: Column, b: Column, bits: int = 32) -> Column:
    """Popcount of XOR via bit_count (built-in)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs at corpus scale: band the ``bits``-bit
    fingerprint into ``bands`` contiguous slices, equi-join on (band_id,
    band_value) to generate candidates, verify with the exact Hamming
    popcount.  ``max_hamming < bands`` makes the banding EXACT by
    pigeonhole (≤ ``max_hamming`` differing bits cannot touch every
    band, so true pairs always share at least one band) — the same
    guarantee the media phash pipeline uses
    (``operators/multimodal.py``).  Never all-pairs: the self-join key
    is the band value, so a shuffle moves fingerprints (one long per
    doc per band), not text — the MinHash-LSH shuffle discipline with
    an 8-byte signature.  Docs with no tokens fingerprint to 0 and pair
    with each other (the minhash null-text convention); drop them
    upstream if unwanted.

    Reference anchor: SimHash near-dup detection per Charikar (2002) /
    Manku et al. (WWW 2007)'s banded exact-search scheme."""
    if bits % bands:
        raise ValueError(f"bands {bands} must divide bits {bits}")
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming {max_hamming} must be < bands {bands} — the "
            "pigeonhole recall guarantee needs more bands than allowed "
            "differing bits"
        )
    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
    )

    width = bits // bands
    mask = (1 << width) - 1
    staged = compute_behind_barrier(
        df.select(F.col(id_col).alias("_id"), F.col(text_col)),
        {"_th": simhash_token_hashes(F.col(text_col))},
    )
    sh = staged.select(
        "_id", simhash_from_token_hashes(F.col("_th"), bits).alias("_fp")
    )
    entries = sh.select(
        "_id",
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("_fp"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("_id", "_fp", "band.band_id", "band.band_val")
    a = entries.alias("a")
    b_ = entries.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(
                F.col("a._fp").bitwiseXOR(F.col("b._fp"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------- ngram jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list[str] | None = None,
    length_col: str | None = "n_chars",
    length_bucket: int = 64,
    threshold: float = 0.5,
    max_block_rows: int | None = 4096,
) -> DataFrame:
    """Blocked word-set Jaccard: candidate pairs share the block key (e.g.
    language) and a coarse length bucket; near-identical lengths are
    required for high Jaccard anyway, so the blocking is safe-ish and
    bounds the quadratic blowup.

    A block with more than ``max_block_rows`` rows (a "hot" block — e.g.
    all short English docs at corpus scale) would still be O(n²) under the
    all-pairs self-join, so oversized blocks switch to an **exact**
    prefix-filter join (AllPairs/PPJoin family): under any global total
    order over tokens, two sets with Jaccard ≥ t must share at least one
    token among the first ``n − ⌈t·n⌉ + 1`` of their sorted distinct
    tokens — so candidates come from an equi-join on (block, prefix
    token), roughly ``(1−t)·n`` join rows per doc instead of pairing with
    every block sibling.  Both paths verify with the same exact Jaccard,
    so the capped output is IDENTICAL to the uncapped one (unlike a
    MinHash fallback, which would be probabilistic) —
    ``tests/test_scale_ops.py`` pins this equivalence on a hot block.
    Set ``max_block_rows=None`` to disable the capped path.
    """
    blocks = list(block_cols or [])
    sel = df.select(
        F.col(id_col).alias("_id"),
        F.array_sort(F.array_distinct(tokens(F.col(text_col)))).alias("_toks"),
        *[F.col(c).alias(f"_blk_{c}") for c in blocks],
        *(
            [
                F.floor(F.col(length_col) / length_bucket).alias("_lb")
            ]
            if length_col
            else []
        ),
    ).withColumn("_n", F.size("_toks"))
    join_cond = [f"_blk_{c}" for c in blocks] + (["_lb"] if length_col else [])

    # Jaccard ≥ t forces min(|a|,|b|) ≥ t·max(|a|,|b|) (overlap ≤ min,
    # union ≥ max): a two-long comparison that belongs in the JOIN
    # condition, where it prunes pairs before any array work.  The
    # 1e-6 slack absorbs double rounding of t·max so a boundary pair
    # (min exactly t·max in real arithmetic) is never excluded —
    # false admits only cost the exact verification below.
    def _size_precheck(na: Column, nb: Column) -> Column:
        return F.least(na, nb).cast("double") >= (
            F.lit(float(threshold)) * F.greatest(na, nb) - F.lit(1e-6)
        )

    def _verify(pairs: DataFrame) -> DataFrame:
        """Exact Jaccard over (id_a, id_b, _ta, _tb, _nsum) candidate
        rows.  |a∪b| = |a|+|b|−|a∩b| for the distinct token arrays, so
        only the INTERSECTION is computed per pair — and exactly once,
        behind a substitution barrier: without it both the threshold
        filter (previously pushed into the join condition) and the
        output projection inline the full intersect+union trees,
        evaluating the hash-set array ops 2× per candidate and 4× per
        surviving pair (round-12 plan finding; guide §7.2)."""
        from qualityassurancetool_spark.functions.partitioning import (
            compute_behind_barrier,
        )

        inter = compute_behind_barrier(
            pairs,
            {
                "_i": F.size(
                    F.array_intersect(F.col("_ta"), F.col("_tb"))
                ).cast("double")
            },
        )
        return inter.select(
            "id_a",
            "id_b",
            (F.col("_i") / (F.col("_nsum") - F.col("_i"))).alias(
                "jaccard"
            ),
        ).where(F.col("jaccard") >= threshold)

    def _allpairs(frame: DataFrame) -> DataFrame:
        a, b = frame.alias("a"), frame.alias("b")
        cond = (F.col("a._id") < F.col("b._id")) & _size_precheck(
            F.col("a._n"), F.col("b._n")
        )
        for k in join_cond:
            cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
        return _verify(
            a.join(b, cond).select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                F.col("a._toks").alias("_ta"),
                F.col("b._toks").alias("_tb"),
                (F.col("a._n") + F.col("b._n")).alias("_nsum"),
            )
        )

    if max_block_rows is None or not join_cond:
        return _allpairs(sel)

    # one tiny aggregation decides each block's physical strategy; the
    # per-block count joins back on the block key (AQE broadcasts it)
    counts = sel.groupBy(*join_cond).agg(F.count(F.lit(1)).alias("_blk_n"))
    sel_n = sel.join(counts, join_cond)
    small = _allpairs(sel_n.where(F.col("_blk_n") <= max_block_rows))

    big = sel_n.where(F.col("_blk_n") > max_block_rows)
    # prefix length for Jaccard ≥ t: overlap ≥ t·|a∪b| ≥ t·n, so a set
    # sharing NO token in its first n − ⌈t·n⌉ + 1 sorted tokens with some
    # other set cannot reach the threshold with it
    n = F.size("_toks")
    plen = F.greatest(
        n - F.ceil(n * F.lit(float(threshold))).cast("int") + 1, F.lit(1)
    )
    pref = big.select(
        "_id",
        *join_cond,
        F.explode(F.slice("_toks", 1, plen)).alias("_ptok"),
    )
    pa, pb = pref.alias("a"), pref.alias("b")
    pcond = (F.col("a._id") < F.col("b._id")) & (
        F.col("a._ptok") == F.col("b._ptok")
    )
    for k in join_cond:
        pcond = pcond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    cand = (
        pa.join(pb, pcond)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    toks_by_id = big.select("_id", "_toks", "_n")
    big_pairs = _verify(
        cand.join(
            toks_by_id.select(
                F.col("_id").alias("id_a"),
                F.col("_toks").alias("_ta"),
                F.col("_n").alias("_na"),
            ),
            "id_a",
        )
        .join(
            toks_by_id.select(
                F.col("_id").alias("id_b"),
                F.col("_toks").alias("_tb"),
                F.col("_n").alias("_nb"),
            ),
            "id_b",
        )
        # the equi-join on the prefix token admits pairs the size bound
        # already refutes; prune them before the array intersection
        .where(_size_precheck(F.col("_na"), F.col("_nb")))
        .select(
            "id_a", "id_b", "_ta", "_tb",
            (F.col("_na") + F.col("_nb")).alias("_nsum"),
        )
    )
    return small.unionByName(big_pairs)


# ------------------------------------------------- incremental (snapshots)

def dedup_against_corpus(
    new_df: DataFrame,
    seen_digests: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    digest_col: str = "content_hash",
) -> DataFrame:
    """Cross-snapshot exact dedup: drop new documents whose normalized
    content digest already exists in a previously-ingested corpus, then
    collapse remaining within-batch duplicates to the min-id copy —
    the incremental half of the dedup story (a daily crawl must not
    re-admit yesterday's documents).

    ``seen_digests`` needs a ``digest_col`` column (e.g. the
    ``content_hash`` sheet :func:`exact_dedup` produces, persisted per
    snapshot).  The anti join is digest-keyed: 16-byte hex strings cross
    the shuffle, never text — and when the seen set fits the broadcast
    threshold Catalyst plans a broadcast anti join with zero shuffle of
    the new batch.  Output: the surviving rows of ``new_df`` plus their
    ``digest_col``.
    """
    withd = new_df.withColumn(
        digest_col, F.md5(normalize_text(F.col(text_col)))
    )
    fresh = withd.join(
        seen_digests.select(digest_col), digest_col, "left_anti"
    )
    w_min = F.min(F.col(id_col)).over(Window.partitionBy(digest_col))
    return (
        fresh.withColumn("_keep", F.col(id_col) == w_min)
        .where(F.col("_keep"))
        .drop("_keep")
    )

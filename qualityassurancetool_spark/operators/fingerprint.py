"""Document fingerprinting via winnowing (rolling char k-gram hashes).

Implements the winnowing scheme of Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD 2003):
hash every character k-gram of the normalized text, slide a window of
``w`` consecutive gram hashes, and keep the minimum hash of each window.
The distinct window-mins are the document's fingerprint set — any shared
substring of length >= k + w - 1 between two documents is GUARANTEED to
produce at least one shared fingerprint, while only ~2/(w+1) of all gram
hashes are kept.

Design for 100 TB:
 - fingerprint extraction is row-local (pure higher-order-function
   Columns, no shuffle, no Python);
 - the copy-detection join is an equi-join on the 8-byte fingerprint —
   the same shuffle-bounded shape as LSH banding (operators/dedup.py);
 - ``max_df`` drops fingerprints shared by more than ``max_df`` documents
   BEFORE the self-join (one count aggregation on the fingerprint key),
   so a boilerplate substring shared by millions of pages can never
   create a quadratic pair blowup — the standard frequency-cap used by
   every production near-dup pipeline;
 - like the dedup family, hashing is portable md5 in the oracle-checked
   mode and engine-native ``xxhash64`` in the fast mode (hash per char
   position; md5 costs ~10x — see the measured 118s -> 2s note on
   MinHash in operators/dedup.py).

Reference parity: the reference engine has no fingerprinting operator —
this is a beyond-reference training-data-pipeline addition (SURVEY.md
S2c), same family as MinHash/SimHash in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import (
    md5_long,
    normalize_text,
)


def chargram_hashes(
    norm: Column, k: int = 8, hash_mode: str = "portable"
) -> Column:
    """Hashes of every character k-gram of ``norm`` -> array<long>.

    ``norm`` MUST be a plain column reference (attribute), not an inline
    expression — Catalyst does not eliminate common subexpressions inside
    higher-order-function lambdas, so an embedded ``regexp_replace`` would
    re-run once per position (see functions/hashing.py CSE note).

    Documents shorter than ``k`` characters produce an empty array (the
    winnowing paper's semantics: nothing to fingerprint below the noise
    threshold k).
    """
    n = F.length(norm)
    idx = F.sequence(F.lit(1), n - (k - 1))
    if hash_mode == "portable":
        gram_hash = lambda i: md5_long(norm.substr(i, F.lit(k)))
    else:
        gram_hash = lambda i: F.xxhash64(norm.substr(i, F.lit(k)))
    return F.when(n >= k, F.transform(idx, gram_hash)).otherwise(
        F.array().cast("array<long>")
    )


def winnow(grams: Column, w: int = 4) -> Column:
    """Winnowing selection over an array of gram hashes -> array<long>
    (distinct window-mins).

    Every window of ``w`` consecutive gram hashes contributes its minimum;
    the result is the DISTINCT set (ties collapse, which is exactly the
    fingerprint-set semantics of the paper — robust winnowing's rightmost
    tie-break only matters for positional fingerprints, which we don't
    keep).  An array with 0 < len < w grams degenerates to one window
    (its global min); an empty array stays empty.

    Cost is O(n_grams * w) comparisons per row, JVM-side inside
    whole-stage codegen — as ``least`` over ``w`` ``element_at`` calls,
    NOT ``array_min(slice(...))``: the slice form allocates a w-element
    array per window (measured ~1.5x slower on the 100k-doc probe).
    ``element_at`` past the end returns null and ``least`` ignores
    nulls, which exactly handles the degenerate fewer-than-w-grams
    window.  For the deque-based O(n) variant to matter, w would have
    to be large; typical w in [4, 64] keeps this within 2x of optimal
    while staying a pure Column expression (no Python stage).
    """
    n_g = F.size(grams)
    n_w = F.greatest(n_g - (w - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_w),
        lambda j: F.least(*[F.element_at(grams, j + i) for i in range(w)]),
    )
    return F.when(n_g > 0, F.array_distinct(mins)).otherwise(
        F.array().cast("array<long>")
    )


def _kernel_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int, w: int
) -> DataFrame:
    """Vectorized winnowing kernel: normalized text → uint8 codes →
    polynomial k-gram rolling hashes (k fused multiply-adds over the
    whole array, numpy uint64 wraparound) → window-min via w
    ``np.minimum`` passes → per-doc unique.  Semantics identical to the
    Column path (same windows, same min-selection); the hash FAMILY
    differs (polynomial vs xxhash64/md5), which near-dup detection is
    agnostic to — use the Column path when cross-engine hash equality
    matters (the oracle does).

    Why it exists: the Column path's per-position substring hash +
    least-of-w runs as interpreted HOF lambdas — measured 52 s for 30M
    char positions at the 100k-doc probe; this kernel does the same
    work as ~k+w vector passes per Arrow batch (measured 3.4 s)."""
    import numpy as np

    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
    )

    P = np.uint64(1099511628211)
    # the id column keeps the INPUT's type (string keys work — the
    # Column path and read_fingerprint_index already do); numpy never
    # touches ids, only the hash arrays
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, fingerprint long"
    normed = compute_behind_barrier(
        df.select(F.col(id_col), F.col(text_col)),
        {"_norm": normalize_text(F.col(text_col))},
    ).select(id_col, "_norm")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids_out: list = []
            fps_out: list = []
            for did, norm in zip(pdf[id_col], pdf["_norm"]):
                b = (norm or "").encode("utf-8")
                n = len(b)
                if n < k:
                    continue
                codes = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                acc = np.zeros(n - k + 1, dtype=np.uint64)
                for j in range(k):
                    acc = acc * P + codes[j : j + n - k + 1]
                n_w = max(len(acc) - w + 1, 1)
                mins = acc[:n_w].copy()
                for j in range(1, min(w, len(acc))):
                    np.minimum(mins, acc[j : j + n_w], out=mins)
                fps = np.unique(mins).astype(np.int64)
                ids_out.extend([did] * len(fps))
                fps_out.append(fps)
            if ids_out:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series(ids_out),
                        "fingerprint": np.concatenate(fps_out),
                    }
                )

    return normed.mapInPandas(run, schema=out_schema)


def document_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 8,
    hash_mode: str = "portable",
    strategy: str = "columns",
) -> DataFrame:
    """(id, fingerprint) rows — the exploded distinct winnowing set.

    Row-local until the final explode; no shuffle.  Feed into
    :func:`fingerprint_overlap_pairs` or persist as the corpus
    fingerprint index (8 bytes per fingerprint, ~2/(w+1) of n_chars rows
    per doc).

    Both intermediates sit behind Generate barriers
    (functions/partitioning.compute_behind_barrier): CollapseProject
    would otherwise inline ``_norm`` into the per-position substring
    lambda (one regexp evaluation PER CHAR POSITION — O(n²) per doc,
    measured 8x on the 100k-doc probe) and ``_g`` into every window
    slice.

    ``strategy="kernel"`` swaps the Column extraction for the
    vectorized numpy winnowing kernel (see :func:`_kernel_fingerprints`
    — ~15x at the 100k-doc probe; byte-level k-grams and a polynomial
    hash family, so fingerprint VALUES differ from the Column path
    while the detection semantics are the same).
    """
    if strategy == "kernel":
        return _kernel_fingerprints(df, text_col, id_col, k, w)
    if strategy != "columns":
        raise ValueError(f"unknown strategy {strategy!r}")
    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
    )

    normed = compute_behind_barrier(
        df.select(F.col(id_col), F.col(text_col)),
        {"_norm": normalize_text(F.col(text_col))},
    )
    grams = compute_behind_barrier(
        normed.select(id_col, "_norm"),
        {"_g": chargram_hashes(F.col("_norm"), k, hash_mode)},
    )
    return grams.select(
        id_col, F.explode(winnow(F.col("_g"), w)).alias("fingerprint")
    )


def near_dedup_against_corpus(
    new_df: DataFrame,
    seen_fp: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 8,
    threshold: float = 0.5,
    max_df: int = 50,
    hash_mode: str = "portable",
    exclude_self_id: bool = False,
) -> DataFrame:
    """Cross-snapshot NEAR-dup admission control: the winnowing analog
    of ``dedup.dedup_against_corpus`` (a daily crawl must not re-admit
    yesterday's documents under a trivial edit).

    ``exclude_self_id=True`` ignores index entries whose id equals the
    new document's own id — REVISION semantics (incremental snapshot
    refresh: a lightly-edited new version of doc X must not be rejected
    as a near-dup of X's own previous version).  Leave False for
    append-only streams, where a resubmission under the same id IS a
    duplicate.

    ``seen_fp`` is the persisted corpus fingerprint index —
    (id, fingerprint) rows from :func:`document_fingerprints` over prior
    snapshots (the caller appends survivors' fingerprints after each
    batch).  A new document is dropped when >= ``threshold`` of ITS
    fingerprints already appear in some single seen document.

    Output: (id, n_fp, kept, dup_of_seen, containment) — one row per
    new document; ``dup_of_seen`` is the smallest qualifying seen id.
    Documents too short to fingerprint keep vacuously (containment 0).

    Scale shape: fingerprints of the new batch only (row-local), one
    equi-join against the index on the 8-byte fingerprint with the
    ``max_df`` boilerplate cap applied to the SEEN side first, one
    (new, seen) pair aggregation.  The index never rescans its text.
    Within-batch near-dups are a separate concern — run
    :func:`fingerprint_overlap_pairs` on the survivors.
    """
    fp_new = document_fingerprints(
        new_df, text_col, id_col, k, w, hash_mode
    ).persist()
    sizes = fp_new.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    # Change-volume proportionality (metered, round 5): semi-join the
    # corpus-sized index down to fingerprints that occur in the NEW
    # batch BEFORE the df count — the semi-join keeps ALL index rows of
    # a surviving fingerprint, so df over the reduced set equals df
    # over the full index for exactly the fingerprints that can join
    # (identical output; fingerprints absent from the batch can't
    # affect it).  With a daily-refresh-sized batch AQE plans this as a
    # broadcast semi-join: the index is SCANNED (compact longs) but
    # never shuffled, and everything downstream is hit-sized.
    seen_hit = seen_fp.join(
        fp_new.select("fingerprint").distinct(), "fingerprint", "left_semi"
    ).persist()
    rare_seen = (
        seen_hit.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fingerprint")
    )
    seen_r = seen_hit.join(rare_seen, "fingerprint").select(
        F.col(id_col).alias("_seen_id"), "fingerprint"
    )
    shared = (
        fp_new.join(seen_r, "fingerprint")
        .groupBy(id_col, "_seen_id")
        .agg(F.count(F.lit(1)).alias("_n_shared"))
    )
    if exclude_self_id:
        shared = shared.where(F.col("_seen_id") != F.col(id_col))
    hits = (
        shared.join(sizes, id_col)
        .withColumn("_cont", F.col("_n_shared") / F.col("n_fp"))
        .filter(F.col("_cont") >= F.lit(threshold))
        .groupBy(id_col)
        .agg(
            F.min("_seen_id").alias("dup_of_seen"),
            F.max("_cont").alias("_max_cont"),
        )
    )
    base = new_df.select(id_col).join(sizes, id_col, "left")
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_fp"), F.lit(0)).alias("n_fp"),
            F.col("dup_of_seen").isNull().alias("kept"),
            "dup_of_seen",
            F.round(F.coalesce(F.col("_max_cont"), F.lit(0.0)), 6).alias(
                "containment"
            ),
        )
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 8,
    max_df: int = 50,
    min_shared: int = 2,
    hash_mode: str = "portable",
    strategy: str = "columns",
) -> DataFrame:
    """Copy-candidate pairs by shared winnowing fingerprints.

    Returns (doc_a, doc_b, n_shared, containment) with doc_a < doc_b,
    where ``containment`` = n_shared / min(|fp_a|, |fp_b|) estimates how
    much of the smaller document's fingerprint set the pair shares (1.0 =
    one document's fingerprinted content is contained in the other).

    Scale shape: one count-agg on the fingerprint key to apply ``max_df``
    (drops boilerplate fingerprints BEFORE the join), one equi-join on the
    fingerprint, one pair-key aggregation.  Shuffle keys are 8-byte longs
    throughout; raw text never moves.
    """
    fp = document_fingerprints(
        df, text_col, id_col, k, w, hash_mode, strategy
    )
    # the index feeds FOUR subplans (sizes, frequency cap, both join
    # sides); Catalyst does not share common subplans across joins, so
    # persist the (id, fingerprint) longs — ~16 bytes/row — instead of
    # extracting fingerprints four times
    fp = fp.persist()
    # per-doc fingerprint set size (for containment denominator)
    sizes = fp.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    # frequency cap: fingerprints in more than max_df docs are boilerplate
    rare = (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fingerprint")
    )
    fp_r = fp.join(rare, "fingerprint")
    a = fp_r.select(
        F.col(id_col).alias("doc_a"), F.col("fingerprint")
    )
    b = fp_r.select(
        F.col(id_col).alias("doc_b"), F.col("fingerprint")
    )
    pairs = (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col(id_col).alias("doc_a"), F.col("n_fp").alias("_na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("doc_b"), F.col("n_fp").alias("_nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least("_na", "_nb"), 6
            ).alias("containment"),
        )
    )


def read_fingerprint_index(
    spark,
    index_dir: str,
    slice_prefix: str,
    exclude: str | None = None,
    id_col: str = "doc_id",
    id_type: str = "long",
):
    """Union of the persisted fingerprint-index slices under
    ``index_dir`` (subdirectories named ``{slice_prefix}N``), excluding
    the slice named ``exclude`` — the in-flight slice a crash replay
    half-wrote must never screen its own batch (shared contract of the
    streaming capstone's ``batch=`` slices and the incremental plan's
    ``upd=`` slices; one implementation so the exclusion rule and the
    empty-index schema cannot drift between them)."""
    import posixpath

    from qualityassurancetool_spark.functions.fs import list_subdirs

    # Hadoop-FS listing, NOT os.listdir: a remote index dir (hdfs://,
    # s3a://) would otherwise read as empty and cross-batch near-dedup
    # would silently disable (review finding, round 8)
    paths = sorted(
        posixpath.join(index_dir, d)
        for d in list_subdirs(spark, index_dir, prefix=slice_prefix)
        if d != exclude
    )
    if paths:
        return spark.read.parquet(*paths)
    # the empty-index fallback must carry the CALLER's id type — a
    # string-keyed corpus screened against a long-typed empty frame only
    # worked through implicit casts (advisor finding); callers pass the
    # simpleString of their batch's id column
    return spark.createDataFrame([], f"{id_col} {id_type}, fingerprint long")

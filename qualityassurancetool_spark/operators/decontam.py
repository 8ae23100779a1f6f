"""Benchmark decontamination: flag training documents sharing word
n-grams with a held-out evaluation/benchmark set — the standard guard
against test-set leakage in LLM training-data pipelines (the GPT-3/PaLM
style n-gram overlap check, reproduced as a pure Spark plan).

Scale design (100 TB train corpus, eval-set-sized benchmark):
 - the benchmark n-gram set is TINY relative to train (benchmarks are
   thousands of docs, train is billions) → build it once, broadcast it;
 - the train side is a map-side explode of per-doc DISTINCT n-gram
   hashes followed by a broadcast-hash semi join — no shuffle touches
   the corpus until the final per-doc count, which shuffles only
   (doc_id, n_grams, gram) hit rows (contaminated grams are rare);
 - n-grams are hashed (portable md5-derived 60-bit ints) so only fixed
   8-byte keys cross the join, never gram strings; the same expression
   is emitted by any md5-capable SQL engine, which is what makes the
   operator oracle-checkable bit-for-bit.

Token/shingle semantics are shared with the dedup family
(``functions.hashing``): normalize → whitespace split → k-gram join with
single spaces, distinct per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import (
    md5_long,
    shingles_from_tokens,
    tokens,
)

GRAM_SALT = "dg:"


def doc_gram_hashes(
    df: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc distinct word-k-gram hash array: ``(id_col, _gs)``.

    Two-step projection (token array materialized first) — Catalyst has
    no CSE inside higher-order-function lambdas, so inlining the split
    would re-tokenize per gram (see functions/hashing)."""
    empty = F.array().cast("array<bigint>")
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tok"))
        .select(
            id_col,
            # a doc with fewer than k tokens has NO k-grams:
            # shingles_from_tokens clamps to one whole-doc gram (the
            # minhash contract), which here made every pair of short or
            # empty docs read as 100% contaminated on a phantom sub-k
            # gram (review finding, round 8)
            F.when(
                F.size(F.col("_tok")) >= k,
                F.array_distinct(
                    F.transform(
                        shingles_from_tokens(F.col("_tok"), k),
                        lambda s: md5_long(s, salt=GRAM_SALT),
                    )
                ),
            )
            .otherwise(empty)
            .alias("_gs"),
        )
    )


def benchmark_ngram_overlap(
    train: DataFrame,
    bench: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_overlap: int = 1,
) -> DataFrame:
    """Per train doc: how many of its distinct k-grams appear anywhere in
    the benchmark set.  Returns only contaminated docs (``n_overlap >=
    min_overlap``): ``(id_col, n_overlap, n_grams, overlap_frac)``."""
    # explode_OUTER, not explode: plain explode makes Catalyst infer a
    # ``size(_gs) > 0`` filter and push it below the gram projection,
    # substituting the ENTIRE tokenize→shingle→hash tree into the filter
    # — including a re-tokenize per shingle inside the lambda (the
    # no-CSE-in-HOF trap; measured ~6× on this query at sf0.1).  With
    # explode_outer no filter is inferred; the null guard sits ABOVE the
    # Generate, where it reads an attribute and cannot be pushed through.
    bench_set = (
        doc_gram_hashes(bench, k, text_col, id_col)
        .select(F.explode_outer("_gs").alias("g"))
        .where(F.col("g").isNotNull())
        .distinct()
    )
    exploded = (
        doc_gram_hashes(train, k, text_col, id_col)
        .select(
            F.col(id_col),
            F.size("_gs").cast("long").alias("n_grams"),
            F.explode_outer("_gs").alias("g"),
        )
        .where(F.col("g").isNotNull())
    )
    hits = exploded.join(F.broadcast(bench_set), "g")
    out = (
        hits.groupBy(id_col, "n_grams")
        # grams are distinct per doc before the explode, so a plain
        # count is already a distinct-gram count (no countDistinct state)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
    )
    return out.select(
        id_col,
        "n_overlap",
        "n_grams",
        F.round(F.col("n_overlap") / F.col("n_grams"), 6).alias(
            "overlap_frac"
        ),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    bench_vectors: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    strategy: str = "gemm",
) -> DataFrame:
    """Embedding-level benchmark contamination: per corpus vector, the
    max cosine similarity against any benchmark vector, the (min) id of
    a benchmark vector achieving it, and ``contaminated`` (max_sim >=
    threshold).  Catches paraphrased/reformatted leakage the n-gram
    check (:func:`benchmark_ngram_overlap`) misses — the embedding-space
    complement, same contract (Brown et al. 2020 App. C uses n-grams;
    semantic variants are standard practice since).

    Scale shape: the benchmark set is SMALL by contract (that is what a
    benchmark is) and enters as ONE nested matrix literal — no join, no
    shuffle, no Python stage; the corpus is scanned once, row-locally.
    Distances use the engine's sequential-fold dot (bit-reproducible);
    benchmark norms are precomputed driver-side, the corpus norm once
    per row.  For benchmark sets too big for a literal (>~10k vectors),
    fall back to ``similarity.blocked_cosine_pairs`` — documented, not
    the default, because real benchmark suites are literal-sized.

    ``strategy="column"`` is the sequential-fold oracle mode
    (bit-reproducible, replicated by the DuckDB oracle);
    ``"gemm"`` (default) scores each Arrow batch against the whole
    benchmark matrix with one BLAS multiply — the HOF fold is
    interpreted, not codegen'd, and measured 55 s vs 1.5 s at
    80k × 50 × 64-dim (the ``pq_encode`` convention; differences are
    float-associativity ulps, invisible at any real threshold).

    Cross-engine: ``tools/extra_oracles.py::x_semantic_decontam``
    (DuckDB cross join + list_cosine_similarity, rounded).
    """
    import math

    from qualityassurancetool_spark.functions.literals import (
        double_matrix_literal,
        long_array_literal,
    )
    from qualityassurancetool_spark.operators.similarity import dot_product

    if not bench_vectors:
        raise ValueError("bench_vectors is empty")
    ids = [int(i) for i, _ in bench_vectors]
    norms = [
        math.sqrt(sum(float(x) * float(x) for x in v))
        for _, v in bench_vectors
    ]
    if any(n == 0.0 for n in norms):
        raise ValueError("zero-norm benchmark vector")
    dims = {len(v) for _, v in bench_vectors}
    if len(dims) != 1:
        raise ValueError(f"benchmark vectors have mixed lengths {sorted(dims)}")
    (dim,) = dims
    if strategy == "gemm":
        return _semantic_decontam_gemm(
            corpus, bench_vectors, ids, norms, threshold, vec_col
        )
    if strategy != "column":
        raise ValueError(f"unknown strategy {strategy!r}")
    # pre-divide each benchmark vector by its norm: the per-row fold is
    # then dot(corpus_vec, unit_bench) / |corpus_vec|
    mat = double_matrix_literal(
        tuple(
            tuple(float(x) / n for x in v)
            for (_, v), n in zip(bench_vectors, norms)
        )
    )
    sims = F.transform(
        mat, lambda bv: dot_product(F.col(vec_col), bv) / F.col("_cn")
    )
    pairs = F.zip_with(
        sims,
        long_array_literal(tuple(ids)),
        # (sim, -id): array_max then yields max sim, min id on ties
        lambda s, i: F.struct(s.alias("s"), (-i).alias("ni")),
    )
    best = F.array_max(pairs)
    # zero-norm, null, AND wrong-length corpus vectors: null/null/False
    # (a ragged row otherwise folds a null dot yet still names a
    # matched_bench_id — review finding, round 9)
    ok = (F.col("_cn") > 0) & (F.size(F.col(vec_col)) == F.lit(dim))
    return (
        corpus.withColumn(
            "_cn", F.sqrt(dot_product(F.col(vec_col), F.col(vec_col)))
        )
        .withColumn("_best", best)
        .select(
            "*",
            F.when(ok, F.col("_best.s")).alias("max_sim"),
            F.when(ok, -F.col("_best.ni")).alias("matched_bench_id"),
            F.coalesce(
                F.when(ok, F.col("_best.s") >= F.lit(float(threshold))),
                F.lit(False),
            ).alias("contaminated"),
        )
        .drop("_best", "_cn")
    )


def _semantic_decontam_gemm(
    corpus: DataFrame,
    bench_vectors: list[tuple[int, list[float]]],
    ids: list[int],
    norms: list[float],
    threshold: float,
    vec_col: str,
) -> DataFrame:
    """Arrow-batched BLAS kernel for :func:`semantic_decontaminate`."""
    import numpy as np
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    B = np.asarray(
        [v for _, v in bench_vectors], dtype=np.float64
    ) / np.asarray(norms, dtype=np.float64)[:, None]
    ids_np = np.asarray(ids, dtype=np.int64)
    # argmax with min-id tie-break: scan candidates in ascending-id
    # order so the FIRST max wins (np.argmax keeps the first)
    order = np.argsort(ids_np, kind="stable")
    B, ids_np = B[order], ids_np[order]
    out_schema = StructType(
        list(corpus.schema.fields)
        + [
            StructField("max_sim", DoubleType()),
            StructField("matched_bench_id", LongType()),
            StructField("contaminated", BooleanType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf["max_sim"] = []
                pdf["matched_bench_id"] = []
                pdf["contaminated"] = []
                yield pdf
                continue
            import pandas as pd

            # null/ragged embeddings must match the column strategy's
            # null/null/False contract, not abort the whole scan (a
            # single bad row crashed np.stack — review finding, round 8;
            # wrong-length vectors joined the diverted set in round 9)
            dim = B.shape[1]
            bad = pdf[vec_col].isna() | pdf[vec_col].map(
                lambda v: v is not None and len(v) != dim
            )
            if bad.any():
                rows = pdf[bad].copy()
                rows["max_sim"] = pd.array([pd.NA] * len(rows), dtype="Float64")
                rows["matched_bench_id"] = pd.array(
                    [pd.NA] * len(rows), dtype="Int64"
                )
                rows["contaminated"] = False
                yield rows
                pdf = pdf[~bad].copy()
                if len(pdf) == 0:
                    continue
            X = np.stack(
                pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64))
            )
            norms = np.linalg.norm(X, axis=1)
            zero = norms == 0.0  # contract: null/null/False (see column path)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (X @ B.T) / norms[:, None]
            sims = np.nan_to_num(sims, nan=-np.inf)
            best = sims.argmax(axis=1)
            mx = sims[np.arange(len(sims)), best]
            ms = pd.array(mx, dtype="Float64")
            mb = pd.array(ids_np[best], dtype="Int64")
            ms[zero] = pd.NA
            mb[zero] = pd.NA
            pdf["max_sim"] = ms
            pdf["matched_bench_id"] = mb
            pdf["contaminated"] = (mx >= threshold) & ~zero
            yield pdf

    return corpus.mapInPandas(kernel, out_schema)

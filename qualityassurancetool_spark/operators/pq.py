"""Product quantization (Jégou, Douze, Schmid — "Product Quantization
for Nearest Neighbor Search", TPAMI 2011) for the embedding column:
compress D-dim float vectors to M small codes (one per subspace) and
answer top-k queries with asymmetric distance computation (ADC) —
query-to-codebook lookup tables instead of full-vector arithmetic.

This completes the ANN family: brute force (exact baseline), LSH
buckets, IVF lists (`operators/similarity`), int8 range quantization
(storage), and now PQ (storage AND search: a 64-dim float vector
becomes M=4 bytes of codes, 64× smaller, with O(M) adds per candidate
at query time).

Scale design (10⁹+ vector corpus):
 - fit reuses ``clustering.kmeans_fit`` per subspace on SLICED vectors
   — M small k-means runs whose centroid tables are (K × D/M) doubles,
   the driver-literal contract shared with IVF;
 - encode is ZERO-shuffle: per subspace an argmin fold against the
   codebook literal (``similarity.nearest_centroids`` on the slice),
   behind a Generate barrier; the corpus never moves;
 - search: queries are SMALL by contract (the ``brute_force_topk``
   convention).  Each query's M×K distance table is computed driver-
   side (numpy-scale work) and shipped as ONE flat literal per query
   row through a broadcast crossJoin; per-candidate cost is M array
   lookups + M adds — no vector arithmetic touches the corpus at
   query time.  Only (query_id, vec_id, dist) enters the top-k
   shuffle.  Compose with IVF lists to cut the candidate set first
   (IVF-ADC, the paper's IVFADC system) — both pieces exist here.

Oracle: numpy exact-replica of the full fit→encode→search chain
(``tools/extra_oracles.py::x_pq``) — same deterministic stride init,
same assignment tie-break, same early stop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.literals import (
    literal_rows_df,
    double_array_literal,
)
from qualityassurancetool_spark.functions.partitioning import (
    compute_behind_barrier,
)
from qualityassurancetool_spark.operators.clustering import (
    _embedding_dim,
    kmeans_fit,
)
from qualityassurancetool_spark.operators.similarity import (
    nearest_centroids,
)


def subspace_bounds(dim: int, m: int) -> list[tuple[int, int]]:
    """[(start_1based, length)] per subspace; dim must divide evenly
    (pad upstream otherwise — keeping the math trivially portable)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    w = dim // m
    return [(i * w + 1, w) for i in range(m)]


def pq_fit(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    max_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init_stride: int = 20,
) -> list[list[list[float]]]:
    """Per-subspace codebooks ``[m][k] -> centroid`` via the shared
    deterministic Lloyd's fit on vector slices."""
    dim = _embedding_dim(df, vec_col)
    books: list[list[list[float]]] = []
    for start, width in subspace_bounds(dim, m):
        sliced = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), start, width).alias(vec_col),
        )
        cents = kmeans_fit(
            sliced,
            k=k,
            max_iter=max_iter,
            vec_col=vec_col,
            id_col=id_col,
            init_stride=init_stride,
        )
        books.append([v for _, v in cents])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    strategy: str = "column",
) -> DataFrame:
    """Input columns + ``pq_code`` (array<int>, length M) — per
    subspace the argmin codebook entry (squared-L2, tie-break on code
    id, matching ``nearest_centroids`` exactly).  Row-local.

    ``strategy="column"`` (default) is the pure-Column oracle mode;
    ``"gemm"`` is the production path for corpus-scale encodes: an
    Arrow-batched numpy kernel computing all M argmins per batch with
    matrix algebra (HOF lambdas are interpreted, not codegen'd — the
    Column fold measured 17 s vs 1.3 s GEMM at 80k × 64-dim).  Same
    convention as the winnowing kernel / dedup fast modes: identical
    structure, float-associativity differences only on exact ties."""
    m = len(codebooks)
    k = len(codebooks[0])
    dim = m * len(codebooks[0][0])
    if strategy == "gemm":
        return _pq_encode_gemm(df, codebooks, vec_col)
    if strategy != "column":
        raise ValueError(f"unknown strategy {strategy!r}")
    codes = []
    for (start, width), book in zip(subspace_bounds(dim, m), codebooks):
        near = nearest_centroids(
            F.slice(F.col(vec_col), start, width),
            list(range(k)),
            book,
            1,
        )
        codes.append(F.element_at(near, 1).cast("int"))
    return compute_behind_barrier(df, {"pq_code": F.array(*codes)})


def _pq_encode_gemm(
    df: DataFrame, codebooks: list[list[list[float]]], vec_col: str
) -> DataFrame:
    """Arrow-batched GEMM encode kernel (see ``pq_encode``)."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    m = len(codebooks)
    width = len(codebooks[0][0])
    books_np = [np.asarray(b, dtype=np.float64) for b in codebooks]
    # StructType.add MUTATES in place — and df.schema is cached on the
    # Python DataFrame, so .add would desync df.columns from the JVM
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("pq_code", ArrayType(IntegerType()))]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                pdf = pdf.copy()
                pdf["pq_code"] = []
                yield pdf
                continue
            X = np.stack(
                pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64))
            )
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * width : (s + 1) * width]
                B = books_np[s]
                d = (
                    (Xs * Xs).sum(axis=1)[:, None]
                    - 2.0 * (Xs @ B.T)
                    + (B * B).sum(axis=1)[None, :]
                )
                codes[:, s] = d.argmin(axis=1)
            pdf = pdf.copy()
            pdf["pq_code"] = [row.tolist() for row in codes]
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def adc_tables(
    qvec: list[float], codebooks: list[list[list[float]]]
) -> list[float]:
    """Flat ADC lookup table for one query: ``dt[sub * K + code] =
    ||q_sub − codebook[sub][code]||²`` (driver-side micro-work: M×K×
    (D/M) multiplies)."""
    m = len(codebooks)
    k = len(codebooks[0])
    width = len(codebooks[0][0])
    out = []
    for s in range(m):
        q = qvec[s * width : (s + 1) * width]
        for c in range(k):
            cv = codebooks[s][c]
            out.append(
                float(sum((a - b) * (a - b) for a, b in zip(q, cv)))
            )
    return out


def pq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k: ``(query_id, neighbor_id, adc_dist)``, nearest first
    per query (ties broken by neighbor id).  ``corpus_codes`` is a
    ``pq_encode`` output; ``queries`` is SMALL (collected to build the
    per-query tables — the brute-force-queries contract)."""
    n_k = len(codebooks[0])
    qrows = queries.select(query_id_col, vec_col).collect()
    spark = corpus_codes.sparkSession
    qt = literal_rows_df(
        spark,
        [
            (int(r[0]), adc_tables([float(x) for x in r[1]], codebooks))
            for r in qrows
        ],
        f"{query_id_col} long, _dt array<double>",
    )
    # idx[m] = m*K + code[m]; dist = Σ dt[idx[m]] — M lookups + M adds
    m_count = len(codebooks)
    idx = F.zip_with(
        F.col("pq_code"),
        F.sequence(F.lit(0), F.lit(m_count - 1)),
        lambda c, s: s * n_k + c,
    )
    dist = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc + F.element_at("_dt", (i + 1).cast("int")),
    )
    scored = (
        corpus_codes.select(id_col, "pq_code")
        .crossJoin(F.broadcast(qt))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            dist.alias("adc_dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


# ------------------------------------------------------------- IVFADC

def ivfadc_index(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    strategy: str = "column",
) -> DataFrame:
    """The paper's IVFADC index (Jégou et al. 2011 §IV): coarse-assign
    each vector to its IVF list, then PQ-encode the RESIDUAL
    ``x − centroid(list(x))`` — residuals are far more clusterable than
    raw vectors, which is what buys IVFADC its accuracy.

    Output: ``(id_col, cluster_id, pq_code)``.  Zero shuffle: coarse
    assignment and residual are literal folds, the residual encode is
    the ``pq_encode`` barrier.  ``codebooks`` must be fitted on
    residuals (see ``ivfadc_fit``)."""
    staged = _residual_frame(df, cents, vec_col, id_col)
    coded = pq_encode(
        staged, codebooks, vec_col="_resid", id_col=id_col,
        strategy=strategy,
    )
    return coded.select(id_col, "cluster_id", "pq_code")


def _residual_frame(
    df: DataFrame, cents, vec_col: str, id_col: str
) -> DataFrame:
    """``(id, cluster_id, _resid)``: coarse-assign each vector and
    subtract its centroid, looked up BY ID — shared by ``ivfadc_index``
    and ``ivfadc_fit`` so build and fit cannot diverge.  The previous
    positional ``element_at(centmat, cluster_id + 1)`` silently
    subtracted the WRONG centroid for any cents list whose ids are not
    exactly 0..n−1 in list order (reordered or pruned), while the
    search side (``ivfadc_topk``) resolves centroids by id — the two
    halves of the API must share the id-keyed convention (review
    finding, round 8)."""
    from qualityassurancetool_spark.functions.literals import (
        double_matrix_literal,
        literal_rows_df,
    )
    from qualityassurancetool_spark.operators.similarity import ivf_assign

    spark = df.sparkSession
    cent_df = literal_rows_df(
        spark, [(c, v) for c, v in cents],
        "cent_id int, cent_vec array<double>",
    )
    assigned = ivf_assign(
        df.select(id_col, vec_col), cent_df, 1, vec_col, id_col
    )
    cents_sorted = sorted(cents, key=lambda cv: cv[0])
    centmat = double_matrix_literal(
        tuple(tuple(float(x) for x in v) for _, v in cents_sorted)
    )
    # id → matrix row position (1-based for element_at)
    pos_map = F.create_map(
        *[
            lit
            for i, (cid, _) in enumerate(cents_sorted)
            for lit in (F.lit(int(cid)), F.lit(i + 1))
        ]
    )
    residual = F.zip_with(
        F.col(vec_col),
        F.element_at(
            centmat,
            F.element_at(pos_map, F.col("cluster_id")).cast("int"),
        ),
        lambda a, b: a.cast("double") - b,
    )
    return compute_behind_barrier(assigned, {"_resid": residual})


def ivfadc_write(
    index: DataFrame,
    path: str,
    mode: str = "overwrite",
    files_per_list: int | None = None,
    n_lists: int | None = None,
) -> None:
    """Persist an ``ivfadc_index`` frame as a ``cluster_id``-partitioned
    parquet layout — the disk form of the IVF inverted lists.

    Why partitioned: ``ivfadc_topk`` restricts its scan with a static
    ``cluster_id IN (probed)`` literal, and against this layout Spark
    resolves that to directory-level partition pruning
    (``PartitionFilters`` in the scan) — a search touches only the
    probed lists' FILES, so serving I/O scales with ``nprobe/n_lists``
    of the index, not its total size.  At 10¹⁰ vectors the unprobed
    lists are never opened, footer reads included.

    ``files_per_list`` (requires ``n_lists``) salts each list into at
    most that many shuffle partitions — each list lands in ≤
    ``files_per_list`` files regardless of size, so one giant list
    can't produce one giant file; None skips the shuffle and keeps the
    incoming partitioning (up to one file per (task, list) pair).

    ``mode="overwrite"`` (a refit rewrite) also deletes any
    ``<path>_appends`` slice root: append slices are encoded with the
    OLD centroids/codebooks, and leaving them behind would let
    :func:`ivfadc_read` silently union stale codes into the fresh
    layout — wrong ADC distances and duplicate ids (advisor finding,
    round 9).  The delete happens AFTER the base write succeeds — a
    crash mid-rewrite must not lose the appended vectors while leaving
    no replacement (review finding, round 10); the residual window
    (new base + stale appends until the delete lands) is the retry's
    to close, same as the flags-table partition rewrite.  Re-append
    the deltas (or fold them into the refit input) after a rewrite.
    """
    df = index
    if files_per_list is not None:
        if n_lists is None:
            raise ValueError("files_per_list requires n_lists")
        id_col = next(c for c in index.columns if c != "cluster_id")
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_list))
        df = df.repartition(
            n_lists * files_per_list, F.col("cluster_id"), salt
        )
    df.write.partitionBy("cluster_id").mode(mode).parquet(path)
    if mode == "overwrite":
        from qualityassurancetool_spark.functions.fs import delete_path

        delete_path(index.sparkSession, _appends_root(path))


def ivfadc_append(
    new_vecs: DataFrame,
    path: str,
    cents: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    strategy: str = "column",
    append_id: str | None = None,
) -> None:
    """Incremental index maintenance: encode ONLY the new vectors with
    the EXISTING coarse centroids + codebooks and append their rows to
    the ``ivfadc_write`` layout — no refit, no touch of existing files
    (parquet append adds files inside the affected ``cluster_id=``
    directories only).  Cost ∝ delta size: the `plans/incremental`
    contract applied to the ANN index.

    Retry semantics (the ``minhash_admit`` discipline, round 9): the
    plain form parquet-APPENDS — a caller retry after a mid-run
    failure double-appends the delta (duplicate rows in the inverted
    lists ⇒ duplicate search hits).  Cron-scripted daily appends pass
    ``append_id=`` (e.g. the crawl date): the delta then lands as a
    cluster_id-partitioned OVERWRITE slice at
    ``<path>_appends/append=<id>/`` — re-running the same id replaces
    its own slice instead of appending, and :func:`ivfadc_read` unions
    base + slices transparently (probed-cluster PartitionFilters apply
    to every root).

    The quantizer ages as the distribution drifts — the standard
    IVF practice (and Jégou et al.'s): append between refits, schedule
    a full ``ivfadc_fit``+rewrite when recall degrades.  Searching the
    layout after an append sees old+new vectors in one scan; a vector
    re-appended under the same id is NOT deduplicated (append-only
    layout — dedup upstream or rewrite)."""
    index = ivfadc_index(
        new_vecs, cents, codebooks, vec_col=vec_col, id_col=id_col,
        strategy=strategy,
    )
    if append_id is not None:
        import re as _re

        append_id = str(append_id)
        if not _re.fullmatch(r"[A-Za-z0-9._-]+", append_id):
            raise ValueError(
                f"append_id {append_id!r} must be [A-Za-z0-9._-]+ "
                "(it names a layout subdirectory)"
            )
        slice_path = _appends_root(path) + f"/append={append_id}"
        index.write.partitionBy("cluster_id").mode("overwrite").parquet(
            slice_path
        )
        return
    index.write.partitionBy("cluster_id").mode("append").parquet(path)


def _appends_root(path: str) -> str:
    return path.rstrip("/") + "_appends"


def _read_one_layout(spark, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    others = [c for c in df.columns if c not in ("cluster_id", "pq_code")]
    if "cluster_id" not in df.columns or "pq_code" not in df.columns:
        raise ValueError(
            f"not an ivfadc_write layout at {path!r}: need cluster_id + "
            f"pq_code columns, found {df.columns}"
        )
    if len(others) != 1:
        # id is identified by elimination, so a reordered / schema-evolved
        # layout with extra data columns must fail loudly, not silently
        # mis-select a positional column as the id
        raise ValueError(
            f"ambiguous ivfadc layout at {path!r}: expected exactly one id "
            f"column besides (cluster_id, pq_code), found {others}"
        )
    return df.select(
        others[0],
        F.col("cluster_id").cast("int").alias("cluster_id"),
        "pq_code",
    )


def ivfadc_read(spark, path: str) -> DataFrame:
    """Read an ``ivfadc_write`` layout back in ``(id, cluster_id,
    pq_code)`` column order with ``cluster_id`` cast back to int (Spark
    surfaces partition-directory values via inference).  Retry-safe
    append slices under ``<path>_appends/append=*`` (see
    :func:`ivfadc_append`) are unioned in transparently — each root is
    its own partitioned scan, so a probed ``cluster_id IN`` filter
    still resolves to directory-level PartitionFilters everywhere."""
    from qualityassurancetool_spark.functions.fs import list_subdirs

    out = _read_one_layout(spark, path)
    root = _appends_root(path)
    for name in sorted(list_subdirs(spark, root, prefix="append=")):
        out = out.unionByName(_read_one_layout(spark, f"{root}/{name}"))
    return out


def ivfadc_fit(
    df: DataFrame,
    n_lists: int = 8,
    m: int = 4,
    k: int = 16,
    max_iter: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[tuple[int, list[float]]], list[list[list[float]]]]:
    """Fit the coarse quantizer, then the PQ codebooks on residuals.
    Returns ``(cents, codebooks)``."""
    from qualityassurancetool_spark.operators.clustering import kmeans_fit

    cents = kmeans_fit(
        df, k=n_lists, max_iter=max_iter, vec_col=vec_col, id_col=id_col
    )
    resid_df = _residual_frame(df, cents, vec_col, id_col).select(
        F.col(id_col), F.col("_resid").alias(vec_col)
    )
    # persist: pq_fit runs m × max_iter assignment jobs, each of which
    # would otherwise re-derive the whole assign+residual chain
    resid_df = resid_df.persist()
    try:
        books = pq_fit(
            resid_df, m=m, k=k, max_iter=max_iter, vec_col=vec_col,
            id_col=id_col,
        )
    finally:
        resid_df.unpersist()
    return cents, books


def ivfadc_topk(
    index: DataFrame,
    queries: DataFrame,
    cents: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    round_digits: int | None = None,
    collected_queries: list[tuple[int, list[float]]] | None = None,
    prune_batches: bool = False,
) -> DataFrame:
    """IVFADC search: probe the ``nprobe`` nearest lists per query and
    ADC-score only their members against per-(query, list) residual
    tables ``dt[m][c] = ||(q − centroid)_m − codebook[m][c]||²``.

    The scale property the flat ``pq_topk`` lacks: candidates enter via
    an equi-JOIN on ``cluster_id`` against the broadcast (query, list,
    table) frame — the corpus outside the probed lists is never
    touched (~nprobe/n_lists of it scores).

    ``round_digits``: rank/cut on the ADC distance ROUNDED to this
    many digits (id tie-break) instead of the raw double.  Exact ADC
    ties — common, since many candidates share codes — otherwise
    split by ULP-level float-associativity noise that differs across
    engines; rounding before the cut makes the shortlist reproducible
    (the ``quantile_bin`` rounded-cut-point discipline).  The emitted
    ``adc_dist`` stays raw.

    ``prune_batches``: keep each Arrow batch's k best per query BEFORE
    the ranking window (value-exact — top-k is closed under batch
    restriction, and the rank key rides along from the Spark side).
    The serving-at-scale switch: the window otherwise sorts every
    scored probed-list row per query (~100 M rows / 822 MB spill at
    the measured 100 M-vector decade); with the prune it sorts
    ≤ batches × queries × k.  Off by default — at bench scale the
    extra Arrow hop costs more than the small sort."""
    # queries are collected to the driver (small by contract); pass
    # ``collected_queries`` when the caller already holds them to
    # save a driver round trip (the q_ann_ivfadc batched-collect)
    if collected_queries is not None:
        qrows = collected_queries
    else:
        qrows = [
            (r[0], r[1])
            for r in queries.select(query_id_col, vec_col).collect()
        ]
    qt_rows = []
    cmap = dict(cents)  # hoisted: rebuilding per probe is queries×nprobe
    for r in qrows:
        qid, qv = int(r[0]), [float(x) for x in r[1]]
        by_d = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cid)
            for cid, cv in cents
        )[:nprobe]
        for _, cid in by_d:
            cv = cmap[cid]
            resid_q = [a - b for a, b in zip(qv, cv)]
            qt_rows.append((qid, cid, adc_tables(resid_q, codebooks)))
    spark = index.sparkSession
    qt = literal_rows_df(
        spark,
        qt_rows,
        f"{query_id_col} long, cluster_id int, _dt array<double>",
    )
    n_k = len(codebooks[0])
    m_count = len(codebooks)
    idx = F.zip_with(
        F.col("pq_code"),
        F.sequence(F.lit(0), F.lit(m_count - 1)),
        lambda c, s: s * n_k + c,
    )
    dist = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc + F.element_at("_dt", (i + 1).cast("int")),
    )
    # static probed-list restriction BEFORE the join: the broadcast hash
    # join alone discards non-probed rows only AFTER scanning them; the
    # probed set is known at plan time (queries are driver-collected), so
    # an IN literal reaches the scan as a pushed filter — row-group
    # min/max skipping on any layout, and FILE-level partition pruning on
    # an `ivfadc_write` cluster_id-partitioned index (PartitionFilters in
    # the scan node), which is what makes search I/O track nprobe/n_lists
    # at 100 TB instead of corpus size.
    probed = sorted({cid for _, cid, _ in qt_rows})
    if probed:
        index = index.where(F.col("cluster_id").isin(probed))
    scored = index.join(F.broadcast(qt), "cluster_id").select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        dist.alias("adc_dist"),
    )
    rank_key = (
        F.round("adc_dist", round_digits)
        if round_digits is not None
        else F.col("adc_dist")
    )
    if prune_batches:
        # map-side per-batch top-k BEFORE the window: the row_number
        # window sorts EVERY scored row per query (probed-list-sized —
        # 100 M rows at the measured 100 M-vector decade, 822 MB of
        # sort spill).  Top-k under a total order is closed under batch
        # restriction, so keeping each Arrow batch's k best per query
        # FIRST is exact — the final window then sorts ≤ batches ×
        # queries × k rows.  The rank key is computed SPARK-SIDE and
        # carried through the kernel (pandas would round half-even
        # where Spark rounds half-up; re-deriving it Python-side could
        # prune a row the final comparator ranks inside the cut).
        scored = scored.withColumn("_rk", rank_key)
        schema = scored.schema

        def _prune(batches):
            for pdf in batches:
                if len(pdf):
                    yield (
                        pdf.sort_values(
                            ["_rk", "neighbor_id"], kind="mergesort"
                        )
                        .groupby(query_id_col, sort=False)
                        .head(k)
                    )

        scored = scored.mapInPandas(_prune, schema)
        rank_key = F.col("_rk")
    w = Window.partitionBy(query_id_col).orderBy(
        rank_key.asc(), F.col("neighbor_id").asc()
    )
    out = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    return out.drop("_rk") if prune_batches else out

"""Embedding clustering (Lloyd's k-means) and semantic deduplication.

``kmeans_fit`` is classic Lloyd's re-expressed in the engine's IVF
vocabulary: assignment reuses ``similarity.ivf_assign`` (centroids as a
driver literal — join-free, shuffle-free over the corpus), and the
update step is ONE partial-aggregable groupBy producing per-dimension
sums (k x dim doubles cross the shuffle, never vectors).  Each
iteration is one corpus pass; callers persist the corpus when iterating
at scale (the 100 TB norm for Lloyd's).

``semantic_dedup`` is the SemDeDup recipe (Abbas et al. 2023,
arXiv:2303.09540): cluster the embedding space, then within each
cluster drop every vector whose cosine similarity to a LOWER-id vector
in the same cluster exceeds ``threshold`` (keep-min-id — deterministic,
order-free).  The pair space is bounded by the cluster partition — the
paper's own device for avoiding corpus-wide all-pairs — and the
within-cluster join is an equi-join on cluster_id.

Determinism: centroid init is the stride-sampled id convention used by
the declared IVF query (``vec_id % stride == 0``, first k by id);
distance folds are sequential (similarity.l2_sq), so a fixed corpus
yields bit-stable assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qualityassurancetool_spark.functions.literals import literal_rows_df
from qualityassurancetool_spark.operators.similarity import ivf_assign


def _embedding_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not row:
        raise ValueError("empty corpus: cannot infer embedding dim")
    return row[0]["d"]


def kmeans_parallel_init(
    df: DataFrame,
    k: int,
    l: int | None = None,
    rounds: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "kmpar:",
) -> list[tuple[int, list[float]]]:
    """Scalable k-means|| initialization (Bahmani et al., "Scalable
    k-means++", VLDB 2012) — deterministic hash-random variant.

    Stride init (the declared-IVF convention) is cheap but blind: on a
    corpus whose low ids concentrate in one region, all k seeds land in
    one cluster and Lloyd's cannot split them apart.  k-means|| fixes
    this with ``rounds`` corpus passes that oversample ~``l`` points
    per round proportionally to d²(x, C) — far regions are found with
    overwhelming probability — then reduces the ≤ 1 + l·rounds
    candidates to k locally, weighted by how many corpus points each
    candidate owns.

    Spark shape per round: the current candidate set enters as ONE
    nested matrix literal (no join, corpus never shuffles); d² is an
    ``array_min`` over the literal behind a Generate barrier; φ = Σd²
    is one partial-agged scalar agg; selection is the engine-standard
    md5 ``uniform_hash(id, salt·round) < l·d²/φ`` — reproducible, no
    ``rand()``.  Only the ~l selected (id, vector) rows reach the
    driver per round.  The final weighting is one more literal
    assignment + count groupBy.  Total: 2·rounds + 2 corpus passes —
    callers persist ``df`` when iterating at scale (same norm as
    ``kmeans_fit``).

    Local reduction: deterministic weighted farthest-point — start
    from the heaviest candidate, repeatedly add the candidate
    maximizing weight × d²(candidate, chosen) (ties on candidate
    order).  Same greedy family the paper suggests for the final
    k-means++ step, but deterministic for reproducibility.

    Randomized-iterative with driver-loop scalars → no cross-engine
    SQL oracle (the PCA precedent); property tests in
    ``tests/test_clustering.py``.
    """
    import numpy as np

    from qualityassurancetool_spark.functions.literals import (
        double_matrix_literal,
        literal_rows_df,
    )
    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
    )
    from qualityassurancetool_spark.operators.sampling import uniform_hash
    from qualityassurancetool_spark.operators.similarity import l2_sq

    if l is None:
        l = 2 * k
    seed_row = (
        df.orderBy(id_col).select(id_col, vec_col).limit(1).collect()
    )
    if not seed_row:
        raise ValueError("empty corpus: cannot initialize")
    cand_ids = [int(seed_row[0][0])]
    cand_vecs = [[float(x) for x in seed_row[0][1]]]

    base = df.select(F.col(id_col), F.col(vec_col))
    for r in range(rounds):
        lit = double_matrix_literal(
            tuple(tuple(v) for v in cand_vecs)
        )
        staged = compute_behind_barrier(
            base,
            {
                "_d2": F.array_min(
                    F.transform(lit, lambda cv: l2_sq(F.col(vec_col), cv))
                )
            },
        )
        phi = staged.agg(F.sum("_d2").alias("s")).collect()[0]["s"]
        if not phi or phi <= 0.0:
            break  # every point coincides with a candidate
        picked = (
            staged.where(
                uniform_hash(F.col(id_col), salt=f"{salt}{r}:")
                < F.lit(float(l)) * F.col("_d2") / F.lit(float(phi))
            )
            .select(id_col, vec_col)
            .collect()
        )
        known = set(cand_ids)
        for row in sorted(picked, key=lambda x: x[0]):
            if int(row[0]) not in known:
                cand_ids.append(int(row[0]))
                cand_vecs.append([float(x) for x in row[1]])
                known.add(int(row[0]))
    if len(cand_ids) < k:
        raise ValueError(
            f"k-means|| produced {len(cand_ids)} < k={k} candidates; "
            f"raise l or rounds (corpus may be tiny)"
        )
    # weight candidates by owned corpus points (one literal assignment)
    cand_df = literal_rows_df(
        df.sparkSession,
        list(zip(range(len(cand_ids)), cand_vecs)),
        "cent_id int, cent_vec array<double>",
    )
    w_rows = (
        ivf_assign(base, cand_df, 1, vec_col, id_col)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    weights = np.zeros(len(cand_ids))
    for row in w_rows:
        weights[row["cluster_id"]] = float(row["w"])
    C = np.asarray(cand_vecs, dtype=np.float64)
    # deterministic weighted farthest-point reduction to k
    chosen = [int(weights.argmax())]
    d2 = ((C - C[chosen[0]]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        score = weights * d2
        score[chosen] = -1.0
        nxt = int(score.argmax())
        chosen.append(nxt)
        d2 = np.minimum(d2, ((C - C[nxt]) ** 2).sum(axis=1))
    return [
        (i, [float(x) for x in C[c]]) for i, c in enumerate(chosen)
    ]


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init_stride: int = 20,
    init: str = "stride",
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means; returns the final [(cent_id, centroid)] list
    (small by design — k x dim doubles, the driver-literal contract of
    ``ivf_assign``).

    ``init="stride"``: the first ``k`` vectors with
    ``id % init_stride == 0`` (ordered by id) — same deterministic
    stride convention as the declared IVF query.  ``init="parallel"``:
    k-means|| (:func:`kmeans_parallel_init`) — use when id order
    correlates with embedding-space position, where stride seeding
    collapses into one region.  Empty clusters keep their previous
    centroid.
    """
    if init == "parallel":
        cents = kmeans_parallel_init(
            df, k, vec_col=vec_col, id_col=id_col
        )
    elif init != "stride":
        raise ValueError(f"unknown init {init!r}")
    else:
        init_rows = (
            df.filter(F.col(id_col) % init_stride == 0)
            .orderBy(id_col)
            .limit(k)
            .select(id_col, vec_col)
            .collect()
        )
        if len(init_rows) < k:
            raise ValueError(
                f"init produced {len(init_rows)} < k={k} centroids; "
                f"lower init_stride"
            )
        cents = [
            (i, [float(x) for x in r[1]]) for i, r in enumerate(init_rows)
        ]
    dim = _embedding_dim(df, vec_col)

    spark = df.sparkSession
    for _ in range(max_iter):
        cent_df = literal_rows_df(
            spark, [(c, v) for c, v in cents],
            "cent_id int, cent_vec array<double>",
        )
        assigned = ivf_assign(
            df.select(id_col, vec_col), cent_df, 1, vec_col, id_col
        )
        sums = (
            assigned.groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at(F.col(vec_col), i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        by_cluster = {r["cluster_id"]: r for r in sums}
        new_cents = []
        for cid, old in cents:
            r = by_cluster.get(cid)
            if r is None or r["n"] == 0:
                new_cents.append((cid, old))  # empty cluster: keep position
            else:
                new_cents.append(
                    (cid, [r[f"s{i}"] / r["n"] for i in range(dim)])
                )
        if all(
            nv == ov for (_, nv), (_, ov) in zip(new_cents, cents)
        ):
            cents = new_cents
            break
        cents = new_cents
    return cents


def kmeans_assign(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Corpus + ``cluster_id`` for a fitted centroid list (one row per
    input row; join-free literal assignment)."""
    spark = df.sparkSession
    cent_df = literal_rows_df(
        spark, [(c, v) for c, v in cents],
        "cent_id int, cent_vec array<double>",
    )
    return ivf_assign(df, cent_df, 1, vec_col, id_col)


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    threshold: float = 0.85,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init_stride: int = 20,
    strategy: str = "gemm",
) -> DataFrame:
    """SemDeDup: (id, cluster_id, kept, dup_of).

    ``kept`` is false iff some lower-id vector in the same cluster has
    cosine similarity >= ``threshold``; ``dup_of`` is the smallest such
    id (null for kept rows).  Keep-min-id is deterministic and
    transitivity-free: each dropped row names an explicit kept-or-
    dropped predecessor, and the minimum id of every near-dup set is
    always kept — the paper's "keep one representative per group".

    ``strategy``:
     - ``"gemm"`` (default): within-cluster pairs via
       ``similarity.blocked_cosine_pairs`` — one ``V @ V.T`` float64
       BLAS multiply per cluster inside ``applyInPandas`` (measured
       ~19x over the fold join on the 8k-vector probe: 39 s → 2 s).
     - ``"fold"``: pure-Column self-equi-join on cluster_id with a
       sequential zip_with dot fold — the bit-reproducible twin the
       cross-engine oracle replicates exactly; norms are precomputed
       once per vector so each pair costs ONE fold, not three.

    Both strategies agree except when a pair's cosine sits within BLAS-
    accumulation ulps of the threshold (see blocked_cosine_pairs' float
    note); SemDeDup thresholds are never that tight in practice.

    Pair work is sum over clusters of |c|^2, the SemDeDup bound; raw
    vectors cross only the within-cluster shuffle.
    """
    cents = kmeans_fit(df, k, max_iter, vec_col, id_col, init_stride)
    assigned = kmeans_assign(
        df.select(id_col, vec_col), cents, vec_col, id_col
    )
    if strategy == "gemm":
        from qualityassurancetool_spark.operators.similarity import (
            blocked_cosine_pairs,
        )

        # emits id_a < id_b within each cluster block by construction
        pairs = blocked_cosine_pairs(
            assigned,
            block_col="cluster_id",
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
        )
        dropped = pairs.groupBy(f"{id_col}_b").agg(
            F.min(f"{id_col}_a").alias("dup_of")
        ).withColumnRenamed(f"{id_col}_b", "id_b")
    elif strategy == "fold":
        from qualityassurancetool_spark.operators.similarity import (
            dot_product,
            l2_norm,
        )

        with_norm = assigned.select(
            "cluster_id",
            F.col(id_col),
            F.col(vec_col).alias("_v"),
            l2_norm(F.col(vec_col)).alias("_n"),
        )
        a = with_norm.select(
            "cluster_id",
            F.col(id_col).alias("id_a"),
            F.col("_v").alias("va"),
            F.col("_n").alias("na"),
        )
        b = with_norm.select(
            "cluster_id",
            F.col(id_col).alias("id_b"),
            F.col("_v").alias("vb"),
            F.col("_n").alias("nb"),
        )
        dropped = (
            a.join(b, "cluster_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(
                dot_product(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb"))
                >= F.lit(threshold)
            )
            .groupBy("id_b")
            .agg(F.min("id_a").alias("dup_of"))
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return (
        assigned.select(id_col, "cluster_id")
        .join(
            dropped.select(
                F.col("id_b").alias(id_col), F.col("dup_of")
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            "cluster_id",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
        )
    )

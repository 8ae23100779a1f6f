"""Optimized Product Quantization (OPQ) — learned-rotation PQ.

PQ (``operators/pq``) quantizes fixed coordinate slices, so its error
is hostage to how variance/correlation happens to align with the
subspace cuts; real embedding spaces concentrate correlated energy in
a few directions and plain PQ wastes code budget.  OPQ-NP (Ge et al.,
"Optimized Product Quantization", CVPR 2013 §4) learns an orthogonal
rotation R jointly with the codebooks by alternating:

 1. rotate:   Y = X Rᵀ (per-row, shuffle-free);
 2. PQ step:  fit/encode subspace codebooks on Y → reconstruction Ŷ;
 3. Procrustes step: R ← argmin_R Σ‖R xᵢ − ŷᵢ‖²  =  V Uᵀ from the SVD
    of the cross-correlation A = Σ xᵢ ŷᵢᵀ.

Spark shape: rotation is an Arrow-batched GEMM (``mapInPandas``; the
pure-Column fold twin exists for parity tests — the ``pca_transform``
matrix-literal device); the PQ step reuses ``pq_fit``/``pq_encode``
unchanged; A is the PCA module's two-phase reduction — per-batch
(dim × dim) partial GEMMs, driver-side sum + SVD.  Per OPQ iteration
the corpus is read rotate+fit+encode+partial times — the rotated table
is persisted per iteration and dropped after (the Lloyd's norm).

No cross-engine SQL oracle: like PCA, the SVD is FP-iterative and the
partial-GEMM reduction order is engine-internal; the pytest gate
checks orthonormality, error-vs-PQ improvement on correlated data,
rotate-strategy parity, and bit-determinism
(``tests/test_opq.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.literals import (
    double_matrix_literal,
)
from qualityassurancetool_spark.operators.pq import (
    pq_encode,
    pq_fit,
    pq_topk,
)
from qualityassurancetool_spark.operators.similarity import l2_sq


def rotate_vectors(
    df: DataFrame,
    R: list[list[float]],
    vec_col: str = "embedding",
    out_col: str | None = None,
    strategy: str = "gemm",
) -> DataFrame:
    """``out_col = R @ vec`` per row (defaults to replacing
    ``vec_col``).  ``"gemm"``: Arrow-batched numpy matmul (production).
    ``"column"``: matrix-literal sequential-fold dots (the
    ``pca_transform`` device) — bit-reproducible, used as the parity
    twin."""
    out = out_col or vec_col
    if strategy == "column":
        lit = double_matrix_literal(tuple(tuple(map(float, r)) for r in R))

        def dot(row: Column) -> Column:
            return F.aggregate(
                F.zip_with(
                    F.col(vec_col), row, lambda x, w: x.cast("double") * w
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )

        return df.withColumn(out, F.transform(lit, dot))
    if strategy != "gemm":
        raise ValueError(f"unknown strategy {strategy!r}")

    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    Rnp = np.asarray(R, dtype=np.float64)
    fields = [f for f in df.schema.fields if f.name != out]
    out_schema = StructType(
        fields + [StructField(out, ArrayType(DoubleType()))]
    )

    def kernel(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf[out] = []
                yield pdf[[f.name for f in out_schema.fields]]
                continue
            X = np.stack(
                pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64))
            )
            Y = X @ Rnp.T
            pdf[out] = [row.tolist() for row in Y]
            yield pdf[[f.name for f in out_schema.fields]]

    return df.mapInPandas(kernel, out_schema)


def _cross_correlation(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str,
    code_col: str = "pq_code",
):
    """A = Σ xᵢ ŷᵢᵀ (dim × dim) via per-batch partial GEMMs, driver
    reduce — x is the ORIGINAL vector, ŷ the codebook reconstruction
    of its code."""
    import numpy as np

    books_np = [np.asarray(b, dtype=np.float64) for b in codebooks]
    slim = df.select(
        F.col(vec_col).cast("array<double>").alias("v"), F.col(code_col)
    )

    def partial(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                pdf["v"].map(lambda v: np.asarray(v, dtype=np.float64))
            )
            codes = np.stack(
                pdf[code_col].map(lambda c: np.asarray(c, dtype=np.int64))
            )
            Yhat = np.concatenate(
                [books_np[s][codes[:, s]] for s in range(len(books_np))],
                axis=1,
            )
            yield pd.DataFrame({"a": [(X.T @ Yhat).ravel().tolist()]})

    parts = slim.mapInPandas(partial, schema="a array<double>").collect()
    dim = sum(len(b[0]) for b in codebooks)
    A = np.zeros((dim, dim))
    for p in parts:
        A += np.asarray(p["a"]).reshape(dim, dim)
    return A


def opq_fit(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    opq_iters: int = 3,
    lloyd_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """(R, codebooks): the learned dim×dim orthogonal rotation and the
    PQ codebooks fitted on the FINAL rotation.  R starts at identity,
    so ``opq_iters=0`` degrades exactly to plain PQ."""
    import numpy as np

    from qualityassurancetool_spark.operators.clustering import (
        _embedding_dim,
    )

    dim = _embedding_dim(df, vec_col)
    R = np.eye(dim)

    base = df.select(F.col(id_col), F.col(vec_col))
    for _ in range(opq_iters):
        rotated = rotate_vectors(
            base, R.tolist(), vec_col, out_col="_rot"
        ).persist()
        try:
            books = pq_fit(
                rotated.select(id_col, F.col("_rot").alias(vec_col)),
                m=m, k=k, max_iter=lloyd_iters,
                vec_col=vec_col, id_col=id_col,
            )
            coded = pq_encode(
                rotated, books, vec_col="_rot", id_col=id_col,
                strategy="gemm",
            )
            A = _cross_correlation(coded, books, vec_col)
        finally:
            rotated.unpersist()
        U, _, Vt = np.linalg.svd(np.asarray(A))
        R = Vt.T @ U.T
    rotated = rotate_vectors(
        base, R.tolist(), vec_col, out_col="_rot"
    ).persist()
    try:
        books = pq_fit(
            rotated.select(id_col, F.col("_rot").alias(vec_col)),
            m=m, k=k, max_iter=lloyd_iters,
            vec_col=vec_col, id_col=id_col,
        )
    finally:
        rotated.unpersist()
    return [list(map(float, r)) for r in R], books


def opq_encode(
    df: DataFrame,
    R: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    strategy: str = "gemm",
) -> DataFrame:
    """Input columns + ``pq_code`` of the ROTATED vector (rotation is
    an implementation detail — the temporary rotated column never
    leaves the operator)."""
    rotated = rotate_vectors(df, R, vec_col, out_col="_rot", strategy=strategy)
    return pq_encode(
        rotated, codebooks, vec_col="_rot", id_col=id_col, strategy=strategy
    ).drop("_rot")


def opq_topk(
    coded: DataFrame,
    queries: DataFrame,
    R: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k in the rotated space: rotate the (small) query side,
    then defer to ``pq_topk`` — corpus codes are already rotated."""
    rq = rotate_vectors(queries, R, vec_col).select(
        query_id_col, vec_col
    )
    return pq_topk(
        coded, rq, codebooks, k=k,
        vec_col=vec_col, id_col=id_col, query_id_col=query_id_col,
    )


def quantization_error(
    coded: DataFrame,
    R: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> float:
    """Σ‖R x − ŷ(code)‖² over the corpus — the objective OPQ minimizes
    (computed with the column-fold twin for reproducibility)."""
    books_lit = F.array(
        *[
            double_matrix_literal(tuple(tuple(map(float, c)) for c in b))
            for b in codebooks
        ]
    )
    recon = F.flatten(
        F.transform(
            F.col("pq_code"),
            lambda c, s: F.element_at(
                F.element_at(books_lit, s + 1), c.cast("int") + 1
            ),
        )
    )
    rotated = rotate_vectors(
        coded, R, vec_col, out_col="_rot", strategy="column"
    )
    row = rotated.select(
        F.sum(l2_sq(F.col("_rot"), recon)).alias("e")
    ).collect()
    return float(row[0]["e"] or 0.0)

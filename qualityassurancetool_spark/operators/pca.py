"""PCA / whitening for embedding columns — the standard preprocessing
in front of ANN and semantic dedup (centering + decorrelation makes
cosine thresholds comparable across corpora; SemDeDup-style pipelines
normalize before clustering).

Distributed shape (the classic two-phase covariance):

 1. ``covariance_stats``: one ``mapInPandas`` pass computes per-Arrow-
    batch partial (count, sum, X^T X) with float64 BLAS GEMM — the only
    thing that crosses to the driver is one (1 + dim + dim*dim) row
    per batch (bounded like every driver collect in this engine: with
    dim=64 that is ~33 KB per batch);
 2. the driver reduces partials and eigendecomposes the (dim x dim)
    covariance with numpy — microseconds at embedding dims;
 3. ``pca_transform`` projects with the component matrix as a single
    JSON literal (functions/literals.py) — sequential-fold dot per
    component, row-local, no shuffle, no Python.

Sign convention: each component is flipped so its largest-|coefficient|
entry is positive — eigenvector sign is otherwise arbitrary and would
make runs incomparable.

No cross-engine oracle: eigendecomposition is FP-iterative, so partial-
sum ordering moves components in the last ulps (same stance as the
sketch operators — property-tested against numpy's own PCA instead:
orthonormality, variance ordering, reconstruction error).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.literals import (
    double_array_literal,
    double_matrix_literal,
)


def covariance_stats(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[int, list[float], list[list[float]]]:
    """(n, mean, covariance) of a vector column in two phases: Arrow-
    batch partial GEMMs, driver reduce.  Covariance is the population
    covariance (divide by n)."""
    import numpy as np

    probe = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not probe:
        raise ValueError("empty corpus: no covariance")
    dim = probe[0]["d"]
    out_schema = "n long, s array<double>, xtx array<double>"
    slim = df.select(F.col(vec_col).cast("array<double>").alias("v"))

    def partial(batches):
        import pandas as pd

        for pdf in batches:
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            )
            if not len(mat):
                continue
            yield pd.DataFrame(
                {
                    "n": [len(mat)],
                    "s": [mat.sum(axis=0).tolist()],
                    "xtx": [(mat.T @ mat).ravel().tolist()],
                }
            )

    parts = slim.mapInPandas(partial, schema=out_schema).collect()
    if not parts:
        raise ValueError("empty corpus: no covariance")
    n = sum(p["n"] for p in parts)
    s = np.zeros(dim)
    xtx = np.zeros((dim, dim))
    for p in parts:
        s += np.asarray(p["s"])
        xtx += np.asarray(p["xtx"]).reshape(dim, dim)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    return n, mean.tolist(), cov.tolist()


def pca_fit(
    df: DataFrame, k: int, vec_col: str = "embedding", whiten: bool = False
) -> dict:
    """Top-k principal components.  Returns {mean, components (k x dim,
    row-orthonormal — scaled by 1/sqrt(eigenvalue) when whitening),
    explained_variance}."""
    import numpy as np

    _, mean, cov = covariance_stats(df, vec_col)
    vals, vecs = np.linalg.eigh(np.asarray(cov))
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x dim
    vals = vals[order]
    # deterministic sign: largest-|coeff| entry positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    if whiten:
        comps = comps / np.sqrt(np.maximum(vals, 1e-12))[:, None]
    return {
        "mean": list(map(float, mean)),
        "components": [list(map(float, c)) for c in comps],
        "explained_variance": list(map(float, vals)),
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Project the vector column onto the fitted components — centering
    + k sequential-fold dots against ONE matrix literal.  Row-local,
    no shuffle, no Python stage."""
    mean = double_array_literal(tuple(model["mean"]))
    comps = double_matrix_literal(
        tuple(tuple(c) for c in model["components"])
    )
    v = F.col(vec_col)
    centered = F.zip_with(
        v, mean, lambda x, m: x.cast("double") - m
    )

    def project(c: Column) -> Column:
        return F.aggregate(
            F.zip_with(centered, c, lambda x, w: x * w),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    return df.withColumn(out_col, F.transform(comps, project))

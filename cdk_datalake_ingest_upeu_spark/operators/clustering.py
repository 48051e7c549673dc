"""Distributed k-means over an embedding column (spherical Lloyd's).

The reference has no clustering; this is a training-data-pipeline
staple (corpus bucketing for mixture balancing, near-dup cluster
analysis, IVF index training at full-corpus quality).

Scale design — the canonical map-reduce Lloyd's iteration:

- vectors are L2-normalized ONCE and persisted (spherical k-means:
  cosine assignment = dot product against normalized centroids);
- each iteration is ONE ``mapInPandas`` pass emitting per-partition
  PARTIAL sums: ``(cluster, count, sum_vec, inertia)`` — k rows per
  partition, vectorized numpy inside the Arrow batch;
- the k×d partial-sum matrix (a few KB) is reduced on the DRIVER —
  the only driver-side step, O(partitions·k·d), independent of corpus
  size. No shuffle at all: the heavy relation never moves.

Determinism: init takes the k lowest-id vectors (an ordered take, not
``limit()`` which returns whichever partitions answer first), numpy
argmax breaks ties toward the lower cluster index, and iteration count
is fixed — same corpus, same result, modulo float-sum ordering across
partitions (sub-ulp; asserted stable by the planted-cluster test).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partial_stats_gen(centroids: np.ndarray, vec_col: str):
    C = centroids  # closed over; ~k×d floats, serialized with the task
    k, d = C.shape

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
            sims = X @ C.T
            assign = np.argmax(sims, axis=1)
            inertia += float((1.0 - sims[np.arange(len(X)), assign]).sum())
            for c in np.unique(assign):
                m = assign == c
                sums[c] += X[m].sum(axis=0)
                counts[c] += int(m.sum())
        yield pd.DataFrame(
            {
                "cluster": np.arange(k, dtype="int32"),
                "count": counts,
                "sum_vec": list(sums),
                "inertia": [inertia] + [0.0] * (k - 1),
            }
        )

    return gen


_PARTIAL_SCHEMA = "cluster int, count long, sum_vec array<double>, inertia double"


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 8,
    iters: int = 5,
):
    """Fit spherical k-means; returns ``(centroids, history)`` where
    ``centroids`` is a k×d numpy array (unit rows) and ``history`` the
    per-iteration inertia list. Empty clusters keep their previous
    centroid (standard Lloyd's fallback)."""
    vecs = df.select(id_col, vec_col)
    # seed from the k smallest hash-bucket values (repo-standard
    # scan-side pattern, cf. operators/sampling.hash_bucket): a
    # deterministic pseudo-random draw — unlike the k lowest ids, which
    # a sorted-by-source corpus makes all one cluster.  Plans as
    # TakeOrdered: per-partition heap of k, only k rows per partition
    # reach the driver; no global sort.
    from cdk_datalake_ingest_upeu_spark.operators.sampling import hash_bucket

    first = [
        np.asarray(r[0], dtype=np.float64)
        for r in vecs.orderBy(
            hash_bucket(F.col(id_col), seed="kmeans"), F.col(id_col)
        )
        .limit(k)
        .select(vec_col)
        .collect()
    ]
    C = np.stack(first)
    C = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)

    work = vecs.select(vec_col).persist()
    history: list[float] = []
    try:
        for _ in range(iters):
            partial = work.mapInPandas(
                _partial_stats_gen(C, vec_col), schema=_PARTIAL_SCHEMA
            ).toPandas()
            counts = np.zeros(len(C), dtype=np.int64)
            sums = np.zeros_like(C)
            for _, row in partial.iterrows():
                counts[row["cluster"]] += row["count"]
                sums[row["cluster"]] += np.asarray(row["sum_vec"])
            history.append(round(float(partial["inertia"].sum()), 6))
            nz = counts > 0
            C = C.copy()
            C[nz] = sums[nz] / counts[nz, None]
            C = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)
    finally:
        work.unpersist()
    return C, history


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Tag each row with its nearest (cosine) centroid — one Arrow-batch
    matmul per partition, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def nearest(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64)
        X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
        return pd.Series(np.argmax(X @ C.T, axis=1).astype("int32"))

    return df.withColumn(out_col, nearest(F.col(vec_col)))


# ---------------------------------------------------------------------------
# Distributed PCA (moment-sketch reduction)

_PCA_PARTIAL_SCHEMA = "n long, sum_vec array<double>, gram array<double>"


def _pca_partial_gen(vec_col: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        G = None
        for pdf in batches:
            if not len(pdf):
                continue
            vals = [v for v in pdf[vec_col].to_numpy() if v is not None]
            if not vals:  # all-NULL batch: skip, don't np.stack-crash
                continue
            dims = {len(v) for v in vals}
            if len(dims) > 1:
                raise ValueError(
                    f"pca: ragged vector lengths {sorted(dims)} in column "
                    f"{vec_col!r} — fix the embedding column upstream"
                )
            X = np.stack(vals).astype(np.float64)
            if s is None:
                d = X.shape[1]
                s = np.zeros(d, dtype=np.float64)
                G = np.zeros((d, d), dtype=np.float64)
            n += len(X)
            s += X.sum(axis=0)
            G += X.T @ X
        if n:
            yield pd.DataFrame({"n": [n], "sum_vec": [s], "gram": [G.ravel()]})

    return gen


def pca_fit(df: DataFrame, vec_col: str = "embedding", *, k: int = 8):
    """Distributed PCA via a single-pass moment sketch.

    The covariance of an n x d embedding table factors into the three
    mergeable moments ``(n, sum(x), sum(x x^T))`` — so the whole fit is
    ONE ``mapInPandas`` pass emitting a (1 + d + d*d)-double partial per
    partition (a d=1024 partial is 8 MB; d=64 is 33 KB), reduced on the
    driver in O(partitions * d^2) independent of corpus size, then a
    d x d ``eigh``. No shuffle: the n-row relation never moves, exactly
    the :func:`kmeans_fit` partial-sum shape. At 100 TB this is the
    only PCA formulation that works — covariance assembly IS the
    scalable part; the d x d eigendecomposition was never distributed
    in any engine.

    Beyond-reference surface (the reference has no linear algebra);
    standard method, cf. the tall-skinny Gram-matrix reduction in
    public Spark MLlib (``RowMatrix.computeGramianMatrix``).

    Returns ``(components, eigenvalues, evr, mean)``: ``components`` is
    a k x d numpy array (rows = principal axes, descending variance),
    ``eigenvalues`` the top-k covariance eigenvalues, ``evr`` the
    explained-variance ratios, ``mean`` the column means.
    """
    partials = df.select(vec_col).mapInPandas(
        _pca_partial_gen(vec_col), schema=_PCA_PARTIAL_SCHEMA
    ).toPandas()
    if not len(partials):
        raise ValueError("pca_fit: empty input (no non-NULL vectors)")
    n = int(partials["n"].sum())
    s = np.sum(np.stack(partials["sum_vec"].to_numpy()), axis=0)
    d = s.shape[0]
    G = np.sum(np.stack(partials["gram"].to_numpy()), axis=0).reshape(d, d)
    mean = s / n
    # unbiased covariance from raw moments
    cov = (G - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    eigenvalues = np.maximum(evals[order], 0.0)
    components = evecs[:, order].T.copy()
    # sign convention: largest-|loading| coordinate positive, so the fit
    # is deterministic (eigh sign is otherwise arbitrary)
    for row in components:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1
    total_var = max(float(np.trace(cov)), 1e-300)
    evr = eigenvalues / total_var
    return components, eigenvalues, evr, mean


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project each vector onto the fitted principal axes — one
    centered Arrow-batch matmul per partition, no shuffle (the k x d
    component matrix ships with the task closure, broadcast-equivalent)."""
    from pyspark.sql.functions import pandas_udf

    W = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)

    @pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64) - mu
        return pd.Series(list(X @ W.T))

    return df.withColumn(out_col, proj(F.col(vec_col)))

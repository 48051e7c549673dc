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

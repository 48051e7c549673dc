"""Similarity search over embedding columns (``array<float>``).

Two paths, as the brief mandates:

- **Brute-force cosine top-k** — the correctness baseline. The query
  set (small) is broadcast against one scan of the corpus; the dot
  product is an unrolled/codegen ``zip_with``+``aggregate`` expression,
  and per-query top-k is a window over the scored rows. One shuffle on
  query_id for the window; the corpus is never re-partitioned. At
  100 TB this is the right plan when queries are few: the scan
  dominates and parallelizes perfectly.

- **LSH-bucketed ANN** — the scale path for many queries: corpus and
  queries get random-hyperplane signatures (same deterministic planes);
  candidates share a signature band bucket, exact cosine re-ranks
  within buckets. Recall is tunable via (n_planes, bands); multi-band
  probing keeps recall high without widening buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.dedup import (
    _dot_literal,
    _hyperplanes,
    cosine,
)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine neighbours per query.

    Returns (query_id, neighbor_id, cosine, rank). Ties break on
    neighbor id for determinism.
    """
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(corpus_id).alias("neighbor_id"),
        F.round(cosine(F.col(corpus_vec), F.col(query_vec)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _band_tags(vec_col: str, planes: list[list[float]], bands: int):
    n_planes = len(planes)
    width = n_planes // bands
    vec = F.col(vec_col)
    bits = [(_dot_literal(vec, p) > 0).cast("int") for p in planes]
    return F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                sum((bits[bi * width + r] * (2**r) for r in range(width)), F.lit(0)).alias(
                    "bucket"
                ),
            )
            for bi in range(bands)
        ]
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    dim: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share >= 1 LSH band bucket with the
    query; exact cosine re-ranks candidates. Output schema matches
    :func:`cosine_topk_bruteforce` (ranks are within retrieved set)."""
    planes = _hyperplanes(dim, n_planes, seed)

    c_tag = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        F.explode(_band_tags(corpus_vec, planes, bands)).alias("bb"),
    ).select("neighbor_id", "__cv", "bb.band", "bb.bucket")

    q_tag = queries.select(
        F.col(query_id),
        F.col(query_vec).alias("__qv"),
        F.explode(_band_tags(query_vec, planes, bands)).alias("bb"),
    ).select(query_id, "__qv", "bb.band", "bb.bucket")

    candidates = (
        c_tag.join(F.broadcast(q_tag), on=["band", "bucket"])
        .select(query_id, "neighbor_id", "__cv", "__qv")
        .dropDuplicates([query_id, "neighbor_id"])
    )
    scored = candidates.select(
        F.col(query_id),
        F.col("neighbor_id"),
        F.round(cosine(F.col("__cv"), F.col("__qv")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

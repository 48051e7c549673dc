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
    _band_bucket_structs,
    _hyperplanes,
    _plane_sign_bits,
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


def _tag_bands(
    df: DataFrame,
    id_expr,
    vec_col: str,
    vec_alias: str,
    planes: list[list[float]],
    bands: int,
):
    """(id, vec, band, bucket) rows: packed sign bits via the vectorized
    Pandas UDF, band buckets extracted by shift/mask (codegen)."""
    n_planes = len(planes)
    return (
        df.select(
            id_expr,
            F.col(vec_col).alias(vec_alias),
            _plane_sign_bits(planes)(F.col(vec_col)).alias("__sig"),
        )
        .select(
            "*", F.explode(_band_bucket_structs(F.col("__sig"), n_planes, bands)).alias("bb")
        )
        .drop("__sig")
        .withColumn("band", F.col("bb.band"))
        .withColumn("bucket", F.col("bb.bucket"))
        .drop("bb")
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

    c_tag = _tag_bands(
        corpus, F.col(corpus_id).alias("neighbor_id"), corpus_vec, "__cv", planes, bands
    )
    q_tag = _tag_bands(queries, F.col(query_id), query_vec, "__qv", planes, bands)

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

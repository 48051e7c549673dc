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

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.functions.localrel import rows_df as _rows_df
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the many-queries scale path
# ---------------------------------------------------------------------------

def _kmeans_centroids(vectors, k: int, iters: int = 8, seed: int = 42):
    """Spherical k-means on a driver-side SAMPLE (bounded memory): a few
    Lloyd iterations over unit vectors; deterministic via seed."""
    V = np.asarray(vectors, dtype=np.float64)
    V = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-12)
    rng = np.random.default_rng(seed)
    C = V[rng.choice(len(V), size=min(k, len(V)), replace=False)].copy()
    for _ in range(iters):
        assign = (V @ C.T).argmax(axis=1)
        for j in range(len(C)):
            members = V[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)
    return C


def _topn_centroid_udf(centroids, n: int):
    """Pandas UDF: per vector, the ids of the n nearest centroids (one
    numpy matmul per Arrow batch)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def topn(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        M = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12)
        sims = M @ C.T
        order = np.argsort(-sims, axis=1)[:, :n]
        return pd.Series(list(order.astype("int32")))

    return topn


def ivf_index_build(
    corpus: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    n_clusters: int = 16,
    sample_size: int = 4096,
    seed: int = 42,
):
    """Build the PERSISTABLE inverted-file index: ``(centroids,
    index_df)`` where index_df = (corpus_id, corpus_vec, cluster_id).

    Write the index ``partitionBy("cluster_id")`` and the steady-state
    probe becomes a PARTITION-PRUNED read: :func:`ivf_index_probe`
    filters the scan to the probed cells, so each query batch touches
    ~n_probe/n_clusters of the index ON DISK — the ANN twin of the
    persisted minhash signature index (operators/dedup.py): the corpus
    is vectorized once, then never re-read whole.
    """
    # scan-side deterministic sample: a bare limit() takes whatever
    # partitions answer first (layout-dependent), and orderBy(id).limit
    # is a full-corpus sort-probe to fetch a few thousand rows — wrong
    # shape at 100x. Instead a hash_bucket FILTER (pushed to the scan,
    # no global order) selects ~2x sample_size rows; only that small
    # set is id-sorted for a deterministic tie-break/truncation.
    from cdk_datalake_ingest_upeu_spark.operators.sampling import hash_bucket

    n_corpus = corpus.count()
    want = min(sample_size, n_corpus)
    cut = (
        1_000_000
        if n_corpus <= 2 * sample_size
        else int(2 * sample_size / n_corpus * 1_000_000)
    )
    sampled = (
        corpus.select(corpus_id, corpus_vec)
        .filter(hash_bucket(F.col(corpus_id), seed="ivf") < cut)
        .orderBy(corpus_id)
        .limit(sample_size)
        .select(corpus_vec)
        .collect()
    )
    if len(sampled) < want:
        # hash shortfall (possible only on pathological key sets): fall
        # back to the exact ordered sample rather than train on too few
        sampled = (
            corpus.select(corpus_id, corpus_vec)
            .orderBy(corpus_id)
            .limit(sample_size)
            .select(corpus_vec)
            .collect()
        )
    sample = [r[0] for r in sampled]
    C = _kmeans_centroids(sample, n_clusters, seed=seed)
    index = corpus.select(
        F.col(corpus_id),
        F.col(corpus_vec),
        _topn_centroid_udf(C, 1)(F.col(corpus_vec))[0].alias("cluster_id"),
    )
    return C, index


def ivf_index_append(
    centroids,
    new_batch: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Steady-state IVF maintenance: assign a NEW vector batch to the
    EXISTING centroids — the rows to ``write.mode("append")
    .partitionBy("cluster_id")`` onto the stored index. No retrain, no
    re-read of indexed history: the append costs one pass over the new
    batch only (the ANN twin of the minhash signature-index append,
    operators/dedup.py incremental mode). Centroids drift as the
    embedding distribution does; recall monitoring (the workload
    contract's pooled-recall floor) is the retrain trigger, exactly as
    in production IVF services."""
    return new_batch.select(
        F.col(corpus_id),
        F.col(corpus_vec),
        _topn_centroid_udf(centroids, 1)(F.col(corpus_vec))[0].alias(
            "cluster_id"
        ),
    )


def ivf_rebalance(
    index: DataFrame,
    centroids,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    overload_factor: float = 2.0,
    split_k: int = 2,
    sample_size: int = 2048,
    seed: int = 42,
):
    """Re-split ONLY the overloaded IVF cells — the maintenance step
    :func:`ivf_index_append` defers: appends assign into FROZEN
    centroids, so under distribution drift mass concentrates in a few
    cells, probes of those cells degenerate toward brute force, and
    recall-per-IO decays. A full retrain rereads the corpus; this
    rebalance touches exactly the hot cells.

    Mechanics (cold cells are never read, reassigned, or rewritten):

    1. Per-cell counts from ONE aggregation of the index's
       (id, cluster_id) columns — n_clusters rows, driver-bounded.
    2. Cells with count > overload_factor * mean are overloaded.
    3. Each overloaded cell trains a local ``split_k``-means on a
       deterministic hash-bucket sample of ITS OWN members (bounded,
       scan-side filter); the first sub-centroid keeps the cell's id —
       so every cold cell's stored ``cluster_id`` remains valid — and
       the rest take fresh ids appended after the existing centroids.
    4. Only the overloaded cells' rows are reassigned (a
       partition-pruned read when the index is stored
       ``partitionBy(cluster_id)``) and rewritten.

    Returns ``(new_centroids, reassigned_df, report)`` where
    ``reassigned_df`` holds the NEW (id, vec, cluster_id) rows for the
    overloaded cells only (the caller overwrites those partitions) and
    ``report`` is a driver-side dict: cells_split, rows_reassigned,
    max_cell_fraction before/after (from counts, no extra scan).

    Scale shape: cost = per-cell count agg (one shuffle of (id, cid))
    + sample + reassignment scan of the hot cells only. A 100 TB index
    with one hot cell pays IO proportional to that cell.
    """
    from cdk_datalake_ingest_upeu_spark.operators.sampling import hash_bucket

    C = np.asarray(centroids, dtype=np.float64)
    counts = {
        int(r["cluster_id"]): int(r["n"])
        for r in index.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    n_cells = len(C)
    mean = total / max(n_cells, 1)
    overloaded = sorted(
        cid for cid, n in counts.items() if n > overload_factor * mean
    )
    report = {
        "cells_total": n_cells,
        "cells_split": len(overloaded),
        "cells": list(overloaded),
        "rows_reassigned": sum(counts[c] for c in overloaded),
        "max_cell_fraction_before": (
            max(counts.values()) / total if total else 0.0
        ),
    }
    if not overloaded:
        report["max_cell_fraction_after"] = report[
            "max_cell_fraction_before"
        ]
        return C, None, report
    new_rows = [C[i] for i in range(n_cells)]
    sub_ids: dict[int, list[int]] = {}
    next_id = n_cells
    hot = index.filter(F.col("cluster_id").isin(overloaded))
    for cid in overloaded:
        cell = hot.filter(F.col("cluster_id") == cid)
        cut = max(
            1, int(min(1.0, 2 * sample_size / counts[cid]) * 1_000_000)
        )
        sampled = (
            cell.filter(
                hash_bucket(F.col(corpus_id), seed=f"ivf-reb-{cid}") < cut
            )
            .orderBy(corpus_id)
            .limit(sample_size)
            .select(corpus_vec)
            .collect()
        )
        if len(sampled) < split_k:
            sampled = (
                cell.orderBy(corpus_id)
                .limit(sample_size)
                .select(corpus_vec)
                .collect()
            )
        sub = _kmeans_centroids(
            [r[0] for r in sampled], split_k, seed=seed + cid
        )
        if len(sub) < 2:
            # the cell's sample has fewer than 2 distinct members: a
            # "split" would rewrite every row back to the same single
            # id — pure IO with no balance gain. Leave the cell alone
            # (and out of the report's split set).
            continue
        ids = [cid]
        new_rows[cid] = sub[0]
        for s in sub[1:]:
            ids.append(next_id)
            new_rows.append(s)
            next_id += 1
        sub_ids[cid] = ids
    # the report counts cells that actually SPLIT (k-means on a
    # too-small / too-uniform sample can decline a split above)
    split_cells = sorted(sub_ids)
    report["cells_split"] = len(split_cells)
    report["cells"] = split_cells
    report["rows_reassigned"] = sum(counts[c] for c in split_cells)
    if not split_cells:
        report["max_cell_fraction_after"] = report[
            "max_cell_fraction_before"
        ]
        return C, None, report
    if split_cells != overloaded:
        hot = index.filter(F.col("cluster_id").isin(split_cells))
    newC = np.stack(new_rows)
    # reassign hot-cell rows among THEIR OWN sub-centroids only: a row
    # split out of cell c must land in one of c's splits (otherwise a
    # neighboring cold cell would need rewriting too)
    sub_map = {
        cid: np.stack([newC[i] for i in ids])
        for cid, ids in sub_ids.items()
    }
    id_map = dict(sub_ids)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def reassign(v: pd.Series, cid: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        M = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12)
        out = np.empty(len(M), dtype="int32")
        for c in np.unique(cid.to_numpy()):
            mask = cid.to_numpy() == c
            sims = M[mask] @ sub_map[int(c)].T
            picks = sims.argmax(axis=1)
            out[mask] = np.asarray(id_map[int(c)], dtype="int32")[picks]
        return pd.Series(out)

    reassigned = hot.select(
        F.col(corpus_id),
        F.col(corpus_vec),
        reassign(F.col(corpus_vec), F.col("cluster_id")).alias("cluster_id"),
    )
    # post-split max fraction: every non-split cell keeps its count;
    # split cells are bounded above by their pre-split count, so the
    # exact post number needs the reassigned counts — one bounded agg
    # over the reassigned rows only
    re_counts = {
        int(r["cluster_id"]): int(r["n"])
        for r in reassigned.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    after = {c: n for c, n in counts.items() if c not in set(split_cells)}
    after.update(re_counts)
    report["max_cell_fraction_after"] = (
        max(after.values()) / total if total else 0.0
    )
    return newC, reassigned, report


def ivf_index_probe(
    index: DataFrame,
    centroids,
    queries: DataFrame,
    *,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    n_probe: int = 4,
) -> DataFrame:
    """Probe a stored IVF index: each query explodes to its ``n_probe``
    nearest centroids, the index SCAN is pre-filtered to exactly those
    cells (an ``isin`` over <= n_queries*n_probe ints — with the index
    partitioned by cluster_id this is partition pruning, the disk-level
    version of the inverted file), and exact cosine re-ranks inside the
    probed cells. The query batch is driver-bounded by construction
    (it is the broadcast side), so it is collected ONCE and its
    centroid assignment computed driver-side with the SAME
    normalize/matmul/argsort numpy code the index-side Pandas UDF
    runs — tagging it lazily cost an Arrow/Python-worker launch per
    evaluation, and the cell-id collect plus the join made that TWO
    launches per probe (the bulk of the r5->r6 ``ann_incremental_probe``
    bench regression)."""
    import pyspark.sql.types as T

    q_sel = queries.select(F.col(query_id), F.col(query_vec))
    q_rows = q_sel.collect()
    C = np.asarray(centroids, dtype=np.float64)
    M = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    M = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12)
    # same argsort the index-side Pandas UDF runs — identical cells
    order = np.argsort(-(M @ C.T), axis=1)[:, :n_probe]
    id_f, vec_f = q_sel.schema.fields
    q_local = _rows_df(index.sparkSession, 
        [
            (r[0], list(r[1]), int(c))
            for r, cells in zip(q_rows, order)
            for c in cells
        ],
        T.StructType(
            [
                T.StructField(query_id, id_f.dataType),
                T.StructField("__qv", vec_f.dataType),
                T.StructField("cluster_id", T.IntegerType()),
            ]
        ),
    )
    probed = sorted({int(c) for cells in order for c in cells})
    c_tag = index.filter(F.col("cluster_id").isin(probed)).select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        "cluster_id",
    )
    candidates = c_tag.join(F.broadcast(q_local), on="cluster_id").select(
        query_id, "neighbor_id", "__cv", "__qv"
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


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_size: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: corpus vectors are bucketed by nearest centroid (the
    inverted file); each query probes its ``n_probe`` nearest centroids
    and exact cosine re-ranks the candidates. One-shot composition of
    :func:`ivf_index_build` + :func:`ivf_index_probe`; the steady-state
    deployment stores the index and probes it incrementally.

    Scale shape: centroid TRAINING uses a bounded driver-side sample
    (the only non-distributed step, standard for IVF); assignment and
    search are one Pandas-UDF pass + one broadcast join on cluster_id —
    cost tracks corpus/n_clusters * n_probe per query, not corpus size.
    """
    C, index = ivf_index_build(
        corpus,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        n_clusters=n_clusters,
        sample_size=sample_size,
        seed=seed,
    )
    return ivf_index_probe(
        index,
        C,
        queries,
        k=k,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        query_id=query_id,
        query_vec=query_vec,
        n_probe=n_probe,
    )


# ---------------------------------------------------------------------------
# Semantic decontamination (embedding-space benchmark overlap)
# ---------------------------------------------------------------------------

def semantic_decontaminate(
    corpus: DataFrame,
    benchmark_vectors: list,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    threshold: float = 0.999,
) -> DataFrame:
    """Embedding-space benchmark decontamination: flag every corpus
    vector whose cosine to ANY benchmark vector reaches ``threshold``
    — the semantic complement of n-gram decontamination (a paraphrased
    or reformatted eval item shares no 5-grams but sits at cosine
    ~0.99+ of the training copy; see e.g. the contamination analyses
    in GPT-3 App. C / PaLM App. — n-gram overlap misses rewrites).

    Returns (corpus_id, max_bench_cosine_q6, contaminated) per corpus
    row: the max cosine against the benchmark set in exact micro-units
    and the threshold flag.

    Cross-engine determinism (this output is value-hashed against a
    DuckDB twin): every per-pair cosine is computed over QUANTIZED
    INTEGER sums — each elementwise product maps through
    ``floor(x*1e9 + 0.5)`` (three IEEE-754 double ops, bit-identical
    in every engine) and the integer sums divide/sqrt through
    identically-specified double conversions — so the result is the
    same integer everywhere, where a straight float dot product picks
    up summation-order noise.

    Scale shape: the benchmark is an EVAL SET — small by definition —
    and rides into the Pandas UDF closure (broadcast); the corpus
    makes ONE Arrow-batched pass with no shuffle and no join. Cost is
    corpus_rows x bench_rows x dim multiply-floors, vectorized per
    batch; memory per batch is batch x bench x dim doubles (Spark's
    Arrow batch size bounds it).
    """
    B = np.asarray(benchmark_vectors, dtype=np.float64)
    qb = np.floor(B * B * 1e9 + 0.5).sum(axis=1)  # exact int-valued
    thr_q6 = math.floor(threshold * 1e6 + 0.5)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def max_cos_q6(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        A = np.stack(v.to_numpy()).astype(np.float64)
        qa = np.floor(A * A * 1e9 + 0.5).sum(axis=1)
        # per-pair quantized dot: floor each elementwise product, THEN
        # sum — the sum of exact integers is order-independent
        qd = np.floor(A[:, None, :] * B[None, :, :] * 1e9 + 0.5).sum(axis=2)
        denom = np.sqrt(qa[:, None] * qb[None, :])
        # zero-norm vectors (all-zero corpus doc or benchmark entry)
        # score cosine 0 deterministically — qd/0 would be NaN and
        # floor(NaN).astype(int64) is undefined (INT64_MIN on most
        # platforms), silently corrupting the row.
        cos = np.where(denom > 0, qd / np.where(denom > 0, denom, 1.0), 0.0)
        q6 = np.floor(cos * 1e6 + 0.5).max(axis=1)
        return pd.Series(q6.astype("int64"))

    return corpus.select(
        F.col(corpus_id),
        max_cos_q6(F.col(corpus_vec)).alias("max_bench_cosine_q6"),
    ).withColumn("contaminated", F.col("max_bench_cosine_q6") >= F.lit(thr_q6))


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of heterogeneous rankings
# ---------------------------------------------------------------------------

def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    *,
    c: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists —
    the standard hybrid-retrieval combiner (lexical BM25 + embedding
    ANN in a RAG stack): each list contributes ``1/(c + rank)`` for
    the documents it retrieved, scores ADD across lists, and the
    fused top-k needs no score calibration between heterogeneous
    scorers (only ranks enter).

    Each input must carry (``id_col``, ``rank``) with rank 1-based.
    Returns (id, rank_0..rank_{N-1}, rrf_q6) — per-list ranks (0 where
    a list did not retrieve the doc) and the fused score in exact
    micro-units: each contribution quantizes through
    ``floor(1e6/(c+rank) + 0.5)`` so the fused score is an integer sum
    — order-exact and engine-portable where a float sum is neither.

    Scale shape: candidate lists are top-k_pool by construction (KB
    rows each); the fusion is an N-way outer join + sum over those
    lists only — the corpus is never touched here. Cost lives in the
    upstream scorers; this stage is driver-trivial at any corpus size.
    """
    tagged = []
    for i, r in enumerate(rankings):
        tagged.append(
            r.select(
                F.col(id_col),
                F.col("rank").cast("long").alias(f"rank_{i}"),
                F.floor(
                    F.lit(1e6) / (F.lit(float(c)) + F.col("rank").cast("double"))
                    + F.lit(0.5)
                )
                .cast("long")
                .alias(f"__c{i}"),
            )
        )
    out = tagged[0]
    for t in tagged[1:]:
        out = out.join(t, id_col, "full_outer")
    score = None
    for i in range(len(rankings)):
        part = F.coalesce(F.col(f"__c{i}"), F.lit(0))
        score = part if score is None else score + part
    out = out.select(
        F.col(id_col),
        *[
            F.coalesce(F.col(f"rank_{i}"), F.lit(0)).alias(f"rank_{i}")
            for i in range(len(rankings))
        ],
        score.cast("long").alias("rrf_q6"),
    )
    return (
        out.orderBy(F.col("rrf_q6").desc(), F.col(id_col).asc()).limit(k)
    )

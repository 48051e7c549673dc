"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the point of these implementations):

- **Exact**: groupBy on a 128-bit content fingerprint — one shuffle on
  an already-tiny key; the canonical row per group is min(doc_id).
- **MinHash + LSH**: signatures are computed scan-side with zero
  shuffles (``xxhash64`` over shingle arrays, all codegen). Banding
  turns the O(n²) pair problem into groupBy(band, band_hash) — pairs
  are only generated WITHIN buckets, so the join fan-out tracks true
  duplicate density rather than n². Candidates are verified with exact
  Jaccard on shingle sets before being reported.
- **SimHash**: 64-bit signature via per-token hashes aggregated
  bitwise; near-dups are pairs within Hamming distance d, found by the
  standard pigeonhole trick (split signature into d+1 blocks; any pair
  within distance d must agree on ≥1 block) — again bucket-join, not
  cross-join.
- **Embedding cosine**: random-hyperplane LSH over the embedding
  column; candidates share a signature prefix bucket and are verified
  with exact cosine. Hyperplanes are generated driver-side from a fixed
  seed (deterministic across runs/executors) and folded into literal
  expressions — no UDF, no broadcast variable needed at plan level.

All stages avoid Python row code; everything is Catalyst expressions.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.text import normalized_text, shingles, ws_tokens


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one canonical row (min id) per exact normalized-text match."""
    fp = F.md5(normalized_text(F.col(text_col))).alias("__fp")
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        df.select("*", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(fingerprint, n_dups, canonical_id) for groups with >1 member."""
    fp = F.md5(normalized_text(F.col(text_col)))
    return (
        df.groupBy(fp.alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _lane_hash_fn(seed: int):
    """One-arg lambda factory: a two-parameter lambda (even via a default
    arg, ``lambda s, i=i:``) is treated by F.transform as
    (element, INDEX) — the seed must be closed over, not defaulted,
    or every lane hashes the array position instead of the lane seed."""
    return lambda s: F.xxhash64(F.lit(seed), s)


def minhash_signature(shingle_arr: Column, num_hashes: int = 32) -> Column:
    """Array of ``num_hashes`` min-hashes. Hash family h_i(s) =
    xxhash64(i, s) — independent 64-bit hashes per seed lane, all JVM-side."""
    lanes = [
        F.array_min(F.transform(shingle_arr, _lane_hash_fn(i)))
        for i in range(num_hashes)
    ]
    return F.array(*lanes)


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    *,
    shingle_n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    sh = shingles(F.col(text_col), shingle_n)
    return df.select(
        "*", sh.alias("__shingles")
    ).withColumn("__minhash", minhash_signature(F.col("__shingles"), num_hashes))


def _band_rows(num_hashes: int, bands: int) -> int:
    rows = num_hashes // bands
    if rows * bands != num_hashes:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    return rows


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard >= threshold.

    banding: signature split into ``bands`` bands of ``num_hashes/bands``
    rows; a pair is a candidate iff some band hashes equal. The band
    groupBy keys are (band_index, hash-of-band), so bucket skew stays
    bounded; verification computes true Jaccard on the shingle sets.
    """
    rows = _band_rows(num_hashes, bands)
    sig = with_minhash(df, text_col, shingle_n=shingle_n, num_hashes=num_hashes).select(
        F.col(id_col).alias("__id"), "__shingles", "__minhash"
    )

    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("__minhash")[b * rows + r] for r in range(rows)]).alias(
                    "bhash"
                ),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("__id", "__shingles", F.explode(band_cols).alias("bb")).select(
        "__id", "__shingles", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash")
    )
    # the self-join below reads this subtree twice; materialize signatures
    # once (at scale you'd checkpoint them to a table for the same reason)
    banded = banded.persist()

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__shingles").alias("sh_a"),
            F.col("b.__shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    return (
        candidates.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> DataFrame:
    """Drop near-duplicates, keeping the smallest id of each duplicate
    cluster (union-find approximated by min-id propagation over pairs:
    one pass is sufficient for star-shaped clusters; chains settle to a
    stable canonical set because every member pairs with the cluster
    minimum via LSH at realistic thresholds)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **lsh_kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, bucketed by length band to bound pair fan-out)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via shingle inverted index.

    Instead of an n² cross-join, explode shingles and self-join on the
    shingle (inverted-index join): only documents SHARING a shingle meet,
    and the per-pair shared-shingle count IS the intersection size, so
    Jaccard = inter / (|A| + |B| - inter) without re-touching the sets.
    """
    base = df.select(
        F.col(id_col).alias("__id"), shingles(F.col(text_col), shingle_n).alias("__sh")
    ).withColumn("__n", F.size("__sh"))
    exploded = base.select("__id", "__n", F.explode("__sh").alias("__g"))
    # self-joined twice below: materialize the shingle pass once
    exploded = exploded.persist()
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.__g") == F.col("b.__g")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__n").alias("n_a"),
            F.col("b.__n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document over whitespace tokens of the
    normalized text. Majority vote per bit via explode + 64 conditional
    sums (one shuffle on the doc id)."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(ws_tokens(normalized_text(F.col(text_col)))).alias("__tok"),
    ).withColumn("__h", F.xxhash64("__tok"))

    bit_sums = [
        F.sum(
            F.when(F.col("__tok").isNull(), F.lit(0)).otherwise(
                F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) * 2 - 1
            )
        ).alias(f"b{b}")
        for b in range(64)
    ]
    votes = toks.groupBy("__id").agg(*bit_sums)

    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return votes.select(F.col("__id").alias(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of their SimHash.

    Pigeonhole: split the 64-bit signature into ``max_hamming+1`` blocks;
    any pair within distance d agrees on at least one block. Join per
    block bucket, verify exact Hamming via bit_count(xor).
    """
    blocks = max_hamming + 1
    width = 64 // blocks
    sigs = simhash64(df, text_col, id_col).select(
        F.col(id_col).alias("__id"), "simhash"
    )
    block_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftrightunsigned(F.col("simhash"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bval"),
            )
            for i in range(blocks)
        ]
    )
    banded = sigs.select("__id", "simhash", F.explode(block_arr).alias("bb")).select(
        "__id", "simhash", F.col("bb.blk").alias("blk"), F.col("bb.bval").alias("bval")
    )
    # self-joined twice below: materialize the signature pass once
    banded = banded.persist()
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (shares the hyperplane machinery with similarity)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    return planes.tolist()


def _plane_sign_bits(planes: list[list[float]]):
    """Arrow-batched Pandas UDF packing sign(dot(vec, plane_i)) for all
    planes into one long (bit i = plane i), via a single numpy matmul
    per batch — the vectorized path for embedding math. Requires
    n_planes <= 62 and non-null vectors."""
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)
    weights = np.uint64(1) << np.arange(P.shape[1], dtype=np.uint64)

    @pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (M @ P) > 0.0
        packed = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
        return pd.Series(packed)

    return sig


def _band_bucket_structs(sig_col: Column, n_planes: int, bands: int) -> Column:
    """Array of (band, bucket) structs extracted from the packed sign
    bits by shift/mask — pure codegen, no per-plane expressions."""
    width = n_planes // bands
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftrightunsigned(sig_col, bi * width)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for bi in range(bands)
        ]
    )


def cosine(vec_a: Column, vec_b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_a = F.sqrt(F.aggregate(vec_a, F.lit(0.0), lambda a, x: a + x.cast("double") ** 2))
    norm_b = F.sqrt(F.aggregate(vec_b, F.lit(0.0), lambda a, x: a + x.cast("double") ** 2))
    return dot / (norm_a * norm_b)


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate embedding pairs (cosine >= threshold).

    Random-hyperplane signature (n_planes sign bits) split into bands;
    pairs sharing any band bucket are verified with exact cosine. For
    cosine 0.95 the angular distance is ~18°, so P(bit agree) ≈ 0.9 and
    a 4-bit band catches a true pair with p≈0.66 per band — 4 bands
    push recall >98% while keeping buckets tiny on spread-out data.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    vec = F.col(vec_col)
    tagged = (
        df.select(
            F.col(id_col).alias("__id"),
            vec.alias("__v"),
            _plane_sign_bits(planes)(vec).alias("__sig"),
        )
        .select(
            "__id",
            "__v",
            F.explode(_band_bucket_structs(F.col("__sig"), n_planes, bands)).alias("bb"),
        )
        .select("__id", "__v", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )
    # self-joined twice below: materialize the signature pass once
    tagged = tagged.persist()

    a, b = tagged.alias("a"), tagged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__v").alias("va"),
            F.col("b.__v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    dim: int,
    threshold: float = 0.95,
    **lsh_kwargs,
) -> DataFrame:
    """Drop embedding near-duplicates (cosine >= threshold), keeping the
    smallest id per duplicate cluster — same min-id policy as
    :func:`minhash_dedup`, over :func:`embedding_near_dup_pairs`."""
    pairs = embedding_near_dup_pairs(
        df, vec_col, id_col, dim=dim, threshold=threshold, **lsh_kwargs
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")

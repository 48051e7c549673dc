"""Streaming dedup with a persisted Bloom filter — O(n_bits) state.

``dropDuplicatesWithinWatermark`` (streaming/stateful.py) is exact but
its state lives in the state store and is bounded only by the watermark
horizon: keys older than the watermark are evicted, so a re-delivery
arriving AFTER the horizon slips through. The Bloom path is the
complementary trade: the filter remembers EVERY key ever seen in a
fixed n_bits/8-byte artifact (16 MB covers ~1e8 keys at ~0.05% fpr),
so unbounded-horizon duplicates are dropped forever — at the cost of a
~fpr chance that a NOVEL key is wrongly dropped as a duplicate. That
asymmetry (never re-admit a dup, rarely lose a new row) is the standard
contract for at-least-once ingest dedup at corpus scale.

The filter is stored and processed as the SPARSE relation
``(word_idx, word, last_epoch)`` — never materialized on the driver:

- **probe**: one broadcast hash join per hash function on ``word_idx``
  plus a ``getbit`` test — row identity preserved, novel rows are the
  complement. (A first cut round-tripped the dense word array through
  the driver per batch — collect + createDataFrame of n_bits/64 rows
  every micro-batch; at 2^23 bits that Python boundary dominated the
  whole query. The sparse join keeps the loop JVM-side at any n_bits.)
- **update**: the novel keys' bits aggregate with the same
  explode + ``bit_or`` groupBy as the batch bloom build, union-merged
  into the previous words (``bit_or`` again — idempotent).
- **commit**: each epoch writes a NEW version directory
  ``<filter_dir>/v<epoch>`` and never mutates a committed one, so a
  crash or foreachBatch replay at any point sees the last complete
  version. ``last_epoch`` rides on every row; a replayed epoch at or
  below it short-circuits — without that, the replay would see its own
  keys in the filter, call every row a duplicate, and clobber the
  epoch's committed output with an empty overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdk_datalake_ingest_upeu_spark.operators.bloom import _buckets, _seeds


def _latest_version(filter_dir: str) -> tuple[str, int] | None:
    """Newest committed (``_SUCCESS``-marked) filter version dir, as
    ``(path, epoch)`` — the directory name encodes the epoch the
    version committed under, so the replay short-circuit needs no Spark
    job to learn it (r15: the per-batch ``last_epoch`` lookup was one
    driver job per micro-batch; the column still rides in the data for
    auditability)."""
    if not os.path.isdir(filter_dir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(filter_dir):
        if not name.startswith("v"):
            continue
        path = os.path.join(filter_dir, name)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        try:
            epoch = int(name[1:])
        except ValueError:
            continue
        if epoch > best_epoch:
            best, best_epoch = path, epoch
    return None if best is None else (best, best_epoch)


def _sparse_words(df: DataFrame, key_col: str, n_bits: int, seeds: list[int]) -> DataFrame:
    """(word_idx, word) bits set by ``df``'s keys — explode + map-side
    partial bit_or; at most n_bits/64 rows out."""
    return (
        df.select(
            F.explode(
                F.array(*_buckets(F.col(key_col), n_bits, seeds))
            ).alias("bucket")
        )
        .select(
            F.floor(F.col("bucket") / F.lit(64)).cast("int").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(bucket % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def _novel_rows(
    probe: DataFrame,
    key_col: str,
    words: DataFrame | None,
    n_bits: int,
    seeds: list[int],
) -> DataFrame:
    """Rows of ``probe`` whose key is definitely NOT in the filter: one
    broadcast join per hash on word_idx + getbit, keep rows where ANY
    hash misses."""
    if words is None:
        return probe
    out = probe
    miss = None
    for i, b in enumerate(_buckets(F.col(key_col), n_bits, seeds)):
        w_idx, w_col = f"__bf_idx{i}", f"__bf_w{i}"
        side = F.broadcast(
            words.select(
                F.col("word_idx").alias(w_idx), F.col("word").alias(w_col)
            )
        )
        out = out.withColumn(w_idx, F.floor(b / F.lit(64)).cast("int")).join(
            side, on=w_idx, how="left"
        )
        m = F.col(w_col).isNull() | (
            F.getbit(F.col(w_col), (b % 64).cast("int")) == F.lit(0)
        )
        miss = m if miss is None else (miss | m)
    drop = [c for i in range(len(seeds)) for c in (f"__bf_idx{i}", f"__bf_w{i}")]
    return out.filter(miss).drop(*drop)


def stream_bloom_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    out_dir: str,
    *,
    key_col: str,
    filter_dir: str,
    checkpoint_dir: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    max_files_per_trigger: int = 1,
    keep_versions: int = 2,
    query_name: str = "stream_bloom_dedup",
):
    """First-arrival-wins streaming dedup against a persisted sparse
    Bloom filter (see module docstring for the exact-vs-approximate
    trade and the crash-safety scheme). The filter at ``filter_dir``
    outlives the query — later runs (or a different pipeline probing
    the same key space) resume from its newest version."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    seeds = _seeds(n_hashes)

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        latest = _latest_version(filter_dir)
        if latest is not None and latest[1] >= epoch_id:
            # replayed epoch AFTER its filter commit: the filter
            # already holds this batch's keys — re-probing would
            # call every row a duplicate and clobber the committed
            # epoch output with an empty overwrite. Short-circuit
            # BEFORE opening the filter parquet (review finding).
            return
        words = spark.read.parquet(latest[0]) if latest else None
        batch_unique = batch_df.dropDuplicates([key_col])
        novel = _novel_rows(batch_unique, key_col, words, n_bits, seeds)
        novel.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )
        novel_read = spark.read.parquet(os.path.join(out_dir, f"epoch={epoch_id}"))
        new_words = _sparse_words(novel_read, key_col, n_bits, seeds)
        base = (
            words.select("word_idx", F.col("word").alias("mask"))
            if words is not None
            else None
        )
        merged = (
            new_words.select("word_idx", F.col("word").alias("mask"))
            if base is None
            else base.unionByName(
                new_words.select("word_idx", F.col("word").alias("mask"))
            )
        )
        committed = (
            merged.groupBy("word_idx")
            .agg(F.bit_or("mask").alias("word"))
            .withColumn("last_epoch", F.lit(int(epoch_id)).cast("long"))
        )
        committed.write.mode("overwrite").parquet(
            os.path.join(filter_dir, f"v{int(epoch_id):09d}")
        )
        # prune old committed versions, newest keep_versions retained
        versions = sorted(
            n for n in os.listdir(filter_dir) if n.startswith("v")
        )
        import shutil

        for stale in versions[:-keep_versions]:
            shutil.rmtree(os.path.join(filter_dir, stale), ignore_errors=True)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )

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

Per micro-batch (foreachBatch):
1. exact batch-local dedup on the key (one batch fits the usual exact
   machinery),
2. probe the persisted filter scan-side (``might_contain`` — pure
   codegen), keep only novel rows,
3. append the novel rows to an epoch-partitioned sink,
4. OR the novel keys into the filter and re-persist it.

Idempotent under foreachBatch's at-least-once retries: the sink
overwrites the epoch directory, and the filter update is an OR — a
replayed epoch re-merges the same bits, a no-op.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdk_datalake_ingest_upeu_spark.operators.bloom import (
    BloomFilter,
    _seeds,
    bloom_build,
    bloom_load,
    bloom_merge,
)


def _load_or_empty(
    spark: SparkSession, filter_dir: str, n_bits: int, n_hashes: int
) -> tuple[BloomFilter, int | None]:
    """(filter, last committed epoch) — epoch None for a fresh filter."""
    try:
        df = spark.read.parquet(filter_dir)
        last_epoch = (
            int(df.select("last_epoch").collect()[0][0])
            if "last_epoch" in df.columns
            else None
        )
        return bloom_load(df), last_epoch
    except Exception:
        return (
            BloomFilter(
                words=[0] * (n_bits // 64), n_bits=n_bits, seeds=_seeds(n_hashes)
            ),
            None,
        )


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
    query_name: str = "stream_bloom_dedup",
):
    """First-arrival-wins streaming dedup against a persisted Bloom
    filter (see module docstring for the exact-vs-approximate trade).
    The filter at ``filter_dir`` outlives the query — later runs (or a
    different pipeline probing the same key space) resume from it."""

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        bf, last_epoch = _load_or_empty(spark, filter_dir, n_bits, n_hashes)
        if last_epoch is not None and last_epoch >= epoch_id:
            # replayed epoch AFTER its filter commit: the filter already
            # contains this batch's keys, so re-probing would call every
            # row a duplicate and clobber the epoch's output with an
            # empty overwrite. The filter commits LAST, so its marker
            # implies the sink write completed — skip the whole epoch.
            return
        batch_unique = batch_df.dropDuplicates([key_col])
        # literal probe inlines the word array into the plan — fine to
        # ~2^21 bits; larger filters probe via broadcast joins on the
        # words table (same result, no giant plan literal)
        if n_bits <= (1 << 21):
            novel = batch_unique.filter(~bf.might_contain(F.col(key_col)))
        else:
            novel = bf.prefilter_join(
                batch_unique, F.col(key_col), spark, negate=True
            )
        novel.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )
        novel_read = spark.read.parquet(os.path.join(out_dir, f"epoch={epoch_id}"))
        merged = bloom_merge(
            bf, bloom_build(novel_read, key_col, n_bits=n_bits, n_hashes=n_hashes)
        )
        # write-then-rename so a crash mid-write cannot corrupt the
        # live filter a concurrent reader (or the retry) loads
        tmp = filter_dir + ".next"
        merged.to_df(spark).withColumn(
            "last_epoch", F.lit(int(epoch_id)).cast("long")
        ).write.mode("overwrite").parquet(tmp)
        import shutil

        if os.path.exists(filter_dir):
            shutil.rmtree(filter_dir)
        os.replace(tmp, filter_dir)

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

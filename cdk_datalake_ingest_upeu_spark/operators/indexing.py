"""Global row numbering / shard assignment without a global sort.

Training-data exports need stable, contiguous global ids (shard files,
sample indices, resumable dataloaders). The naive Spark spelling —
``row_number() OVER (ORDER BY key)`` — plans a window with an EMPTY
partition spec: every row funnels through ONE task. At 100 TB that is
the single worst plan Spark can produce.

The scalable shape is the classic two-pass zipWithIndex, kept entirely
in the DataFrame layer:

1. ``repartitionByRange(key)`` + ``sortWithinPartitions(key)`` gives a
   total order split into disjoint sorted ranges (one range exchange —
   the unavoidable cost of a total order).
2. ``monotonically_increasing_id()`` encodes ``partition_id * 2^33 +
   local_offset`` from the physical row position — the within-partition
   rank for free, no window, no second shuffle.
3. A per-partition count aggregate (``n_partitions`` rows to the
   driver) turns local offsets into global ones via a literal offset
   array probed with ``element_at`` — pure codegen.

The sorted layout is frozen with scratch_persist so pass 2 and pass 3
see identical physical placement (mid values are position-dependent);
callers must go through the returned frame, then release with
``finalize`` — the same contract as every staged operator here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.scratch import scratch_persist

# monotonically_increasing_id layout: upper 31 bits partition id,
# lower 33 bits the record offset within the partition
_MID_OFFSET_BITS = 33


def assign_global_ids(
    df: DataFrame,
    order_by: str | list[str],
    *,
    id_col: str = "global_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = contiguous 0..n-1 rank of each row in the total
    order of ``order_by`` (ties broken arbitrarily but consistently
    within this assignment — pass a unique key for reproducible ids).

    One range exchange + one O(n_partitions) driver probe; no
    single-task window, no join against the data.
    """
    keys = [order_by] if isinstance(order_by, str) else list(order_by)
    parts = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    )
    sorted_parts = scratch_persist(parts.sortWithinPartitions(*keys))

    counts = (
        sorted_parts.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_parts = (max(r.pid for r in counts) + 1) if counts else 0
    per_pid = {r.pid: r.n for r in counts}
    offsets, acc = [], 0
    for pid in range(n_parts):
        offsets.append(acc)
        acc += per_pid.get(pid, 0)

    offsets_lit = F.lit(offsets or [0]).cast("array<long>")
    mid = F.monotonically_increasing_id()
    local = F.pmod(mid, F.lit(1 << _MID_OFFSET_BITS))
    gid = F.element_at(offsets_lit, F.spark_partition_id() + F.lit(1)) + local
    return sorted_parts.withColumn(id_col, gid)


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    epoch: int,
    rank_col: str = "epoch_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic per-epoch training order: ``rank_col`` = the row's
    position in the total order of ``md5(epoch || ':' || id)`` — a
    different, fully reproducible permutation per epoch (the dataloader
    shuffle at corpus scale: resumable mid-epoch, identical across
    re-runs and cluster layouts, no RNG state to ship). Ranks come from
    :func:`assign_global_ids` over the digest key — one range exchange,
    never a single-task ``row_number() OVER (ORDER BY ...)``."""
    key = F.md5(
        F.concat(
            F.lit(str(int(epoch))), F.lit(":"), F.col(id_col).cast("string")
        )
    )
    return assign_global_ids(
        df.withColumn("__shufkey", key),
        "__shufkey",
        id_col=rank_col,
        num_partitions=num_partitions,
    ).drop("__shufkey")


def with_shard(
    df: DataFrame,
    id_col: str = "global_id",
    *,
    shard_size: int,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Contiguous fixed-size shard assignment over existing global ids
    (rows [i*shard_size, (i+1)*shard_size) -> shard i) — the layout a
    sequential training dataloader expects."""
    return df.withColumn(
        shard_col, F.floor(F.col(id_col) / F.lit(shard_size)).cast("long")
    )

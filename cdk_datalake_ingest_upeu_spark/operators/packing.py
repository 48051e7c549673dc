"""Sequence packing: batch short documents into fixed token budgets.

LLM pretraining consumes fixed-length sequences; feeding one short
document per sequence wastes most of the context window, so pipelines
PACK documents until the token budget is full. At 100 TB exact global
bin-packing is impossible (and unnecessary) — the standard approach is
deterministic partition-local greedy packing:

- documents are assigned to ``n_groups`` deterministic groups by key
  hash (stable across runs and cluster sizes — NOT by physical
  partition, which would make pack ids change with parallelism),
- within a group, documents are folded in key order into consecutive
  packs, closing a pack when the next document would overflow the
  budget (first-fit-sequential),
- the fold is one Arrow batch per group; pack boundaries are found with
  ``np.searchsorted`` over the token cumsum — O(packs · log docs), no
  per-row Python loop.

A document longer than the budget gets a pack of its own (callers chunk
or drop those upstream; they are flagged ``oversize``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACK_SCHEMA_SUFFIX = [
    T.StructField("pack_id", T.LongType()),
    T.StructField("pack_pos", T.IntegerType()),
    T.StructField("oversize", T.BooleanType()),
]


def _pack_group(token_budget: int):
    """Per-group fold: ids arrive sorted; emit pack assignments."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__key").reset_index(drop=True)
        toks = pdf["__tokens"].to_numpy(dtype="int64")
        n = len(toks)
        cum = np.cumsum(toks)
        pack_local = np.empty(n, dtype="int64")
        pos = np.empty(n, dtype="int32")
        start = 0
        offset = 0
        pack_idx = 0
        while start < n:
            # furthest doc whose running sum stays within budget
            end = int(np.searchsorted(cum, offset + token_budget, side="right"))
            if end <= start:  # oversize doc: its own pack
                end = start + 1
            pack_local[start:end] = pack_idx
            pos[start:end] = np.arange(end - start, dtype="int32")
            offset = cum[end - 1]
            pack_idx += 1
            start = end
        grp = int(pdf["__grp"].iloc[0])
        out = pdf.drop(columns=["__grp", "__key"]).copy()
        # globally unique pack id: (group << 32) | local index
        out["pack_id"] = (np.int64(grp) << np.int64(32)) | pack_local
        out["pack_pos"] = pos
        out["oversize"] = toks > token_budget
        return out

    return pack


def pack_documents(
    df: DataFrame,
    *,
    token_budget: int,
    tokens_col: str,
    id_col: str = "doc_id",
    n_groups: int = 64,
) -> DataFrame:
    """Assign every row a ``pack_id``/``pack_pos`` such that each pack's
    token sum fits ``token_budget`` (except single oversize documents).
    Deterministic: same corpus -> same packs, independent of cluster
    layout. One shuffle (the group-by-hash), one Arrow pass per group.

    ``n_groups`` trades parallelism against packing quality: each group
    wastes at most one partial pack, so total fill stays near-optimal as
    long as groups hold many packs (at 100 TB raise it so one group's
    documents fit an executor's memory)."""
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    prepared = df.withColumn(
        "__grp", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups))
    ).withColumn("__key", F.col(id_col)).withColumn(
        "__tokens", F.col(tokens_col).cast("long")
    )
    out_schema = T.StructType(
        [f for f in prepared.schema.fields if f.name not in ("__grp", "__key")]
        + PACK_SCHEMA_SUFFIX
    )
    packed = prepared.groupBy("__grp").applyInPandas(
        _pack_group(token_budget), schema=out_schema
    )
    return packed.drop("__tokens")


def pack_stats(packed: DataFrame, *, tokens_col: str) -> DataFrame:
    """Fill-rate diagnostics over a packed corpus: one row per pack ->
    aggregate min/avg/max fill."""
    per_pack = packed.groupBy("pack_id").agg(
        F.sum(F.col(tokens_col).cast("long")).alias("pack_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.max("pack_tokens").alias("max_pack_tokens"),
        F.round(F.avg("pack_tokens"), 2).alias("avg_pack_tokens"),
        F.sum("has_oversize").alias("n_oversize_packs"),
    )

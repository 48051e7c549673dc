"""Join helpers for scale: skew salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
explicit, planner-independent tool for the pathological case — a handful
of hot keys owning a large fraction of a 100 TB fact table — and for
aggregations, where AQE does not split hot groupBy keys.

``salted_join``: the skewed (large) side gets a per-row salt in
``[0, buckets)``; the other side is replicated ``buckets`` times with
every salt value; the join key becomes (key, salt), spreading each hot
key over ``buckets`` shuffle partitions. Replication multiplies the
small side by ``buckets`` — use only when the small side times buckets
still fits comfortably per executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    *,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``buckets``
    shuffle partitions.

    Result equals ``skewed.join(other, on, how)`` for inner/left joins
    (``other`` must be unique per key for left joins to avoid inflating
    matches — same contract as the plain join).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")

    # deterministic per-row salt: hash of the whole row spreads rows of
    # the same key uniformly without RNG (safe under task retries)
    salted = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(buckets))
    )
    replicated = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i).cast("long") for i in range(buckets)]))
    )
    out = salted.join(replicated, keys + [_SALT], how)
    return out.drop(_SALT)


def skew_stats(df: DataFrame, key: str | list[str], top: int = 10) -> DataFrame:
    """Per-key row counts + share of total, descending — the diagnostic
    you run before deciding a key needs salting."""
    keys = [key] if isinstance(key, str) else list(key)
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.col("n_rows").desc())
        .limit(top)
    )

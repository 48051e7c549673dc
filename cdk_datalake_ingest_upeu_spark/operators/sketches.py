"""Mergeable sketch rollups — distinct counts and quantiles at 100 TB.

The reference's metric queries (COUNT gates, MIN/MAX probes) rescan the
source every time. At lake scale the standard answer is mergeable
sketches: aggregate each ingest partition ONCE into a tiny binary
sketch (DataSketches HLL for distincts, KLL for quantiles — both built
into Spark 4), persist the sketches next to the data, and answer any
coarser-grain question (weekly / monthly / all-time distincts and
percentiles) by merging kilobytes instead of rescanning terabytes.

Accuracy contract (why these are rows-only for the oracle): HLL
estimates are exact while the sketch is in sparse mode (small
cardinalities) and ~1.6% RSE beyond; KLL p50/p95 land within ~1%
rank error at default k. The quality tests in
tests/test_scale_operators.py pin both bounds against exact
aggregation, and the merge-consistency test pins that
union-of-daily == direct-over-week, which is the property that makes
incremental maintenance sound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scalar two-sketch KLL merge folded over the collected group — Spark
# ships kll_sketch_merge_* as a binary scalar fn, not an aggregate
_KLL_FOLD = (
    "aggregate(slice({c}, 2, size({c}) - 1), {c}[0], "
    "(a, x) -> kll_sketch_merge_double(a, x))"
)


def daily_sketches(
    df: DataFrame,
    distinct_col: str,
    quantile_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """One row per day: HLL sketch of ``distinct_col`` + KLL sketch of
    ``quantile_col``. This is the persistable artifact — computing it is
    the only pass over the raw data; one shuffle on the day key with
    map-side partial sketch merge."""
    return (
        df.withColumn("day", F.date_trunc("day", ts_col))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.hll_sketch_agg(distinct_col).alias("hll_sketch"),
            F.expr(f"kll_sketch_agg_double({quantile_col})").alias("kll_sketch"),
        )
    )


def rollup_sketches(
    daily: DataFrame,
    grain: Column,
    quantiles: list[float] = (0.5, 0.95),
) -> DataFrame:
    """Merge daily sketches up to ``grain`` (e.g. ``F.date_trunc('week',
    'day')``): distinct estimate via ``hll_union_agg``, quantiles via a
    fold of ``kll_sketch_merge_double`` over the collected group.
    Touches only the sketch table — never the raw data."""
    merged = (
        daily.groupBy(grain.alias("grain"))
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias(
                "est_distinct"
            ),
            F.collect_list("kll_sketch").alias("__ks"),
        )
    )
    merged = merged.withColumn("__k", F.expr(_KLL_FOLD.format(c="__ks")))
    for q in quantiles:
        merged = merged.withColumn(
            f"p{int(q * 100)}",
            F.expr(f"kll_sketch_get_quantile_double(__k, {q}d)"),
        )
    return merged.drop("__ks", "__k")


def cms_daily(
    df: DataFrame,
    item_col: str,
    ts_col: str = "ts",
    *,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """One Count-Min sketch per day over ``item_col`` — the mergeable
    frequency summary completing the sketch family (HLL = distincts,
    KLL = quantiles, CMS = per-item counts). Same contract as
    daily_sketches: one shuffle on the day key with map-side partial
    merge; the per-day binary is a few KB at eps=1e-4 regardless of
    input size, so any coarser-grain frequency question is answered
    from kilobytes."""
    return (
        df.withColumn("day", F.date_trunc("day", ts_col))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_min_sketch(
                item_col, F.lit(eps), F.lit(confidence), F.lit(seed)
            ).alias("cms_sketch"),
        )
    )


def cms_estimate(daily: DataFrame, items: list[str]) -> dict[str, int]:
    """Merge the daily CMS binaries (driver-side: sketches are KB-scale
    and Spark ships no cms_merge aggregate) and point-query the given
    items. Guarantees: estimate >= true count, and with probability
    ``confidence``, estimate <= true + eps * total_items."""
    rows = daily.select("cms_sketch").collect()
    spark = daily.sparkSession
    jvm_cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    merged = None
    for r in rows:
        sk = jvm_cms.readFrom(bytes(r.cms_sketch))
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    if merged is None:
        return {i: 0 for i in items}
    return {i: int(merged.estimateCount(i)) for i in items}

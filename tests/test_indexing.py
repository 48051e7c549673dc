"""Global id assignment: contiguity, order agreement, sharding, and
CMS sketch guarantees (the new frequency member of the sketch family)."""

import os

from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.indexing import (
    assign_global_ids,
    with_shard,
)
from cdk_datalake_ingest_upeu_spark.operators.scratch import release_scratch
from cdk_datalake_ingest_upeu_spark.operators.sketches import (
    cms_daily,
    cms_estimate,
)


def test_global_ids_contiguous_and_ordered(spark):
    # keys deliberately NOT in insertion order and skewed across values
    df = spark.range(10_000).select(
        ((F.col("id") * 2654435761) % 99991).alias("k"), F.col("id").alias("v")
    ).distinct()
    n = df.count()
    try:
        ids = assign_global_ids(df, "k", num_partitions=7)
        rows = ids.select("k", "global_id").collect()
    finally:
        release_scratch()
    got = sorted((r.k, r.global_id) for r in rows)
    # contiguous 0..n-1
    assert sorted(g for _, g in got) == list(range(n))
    # rank order == key order
    assert [g for _, g in got] == list(range(n))


def test_global_ids_multi_column_order(spark):
    df = spark.range(500).select(
        (F.col("id") % 7).alias("a"), F.col("id").alias("b")
    )
    try:
        ids = assign_global_ids(df, ["a", "b"], num_partitions=4)
        rows = sorted((r.a, r.b, r.global_id) for r in ids.collect())
    finally:
        release_scratch()
    assert [g for _, _, g in rows] == list(range(500))


def test_global_ids_empty(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    try:
        assert assign_global_ids(df, "k", num_partitions=3).count() == 0
    finally:
        release_scratch()


def test_with_shard_sizes(spark):
    df = spark.range(1000).select(F.col("id").alias("global_id"))
    shards = (
        with_shard(df, shard_size=64)
        .groupBy("shard_id")
        .count()
        .collect()
    )
    sizes = {r.shard_id: r["count"] for r in shards}
    assert len(sizes) == 16  # ceil(1000/64)
    assert all(v == 64 for s, v in sizes.items() if s < 15)
    assert sizes[15] == 1000 - 15 * 64


def test_cms_guarantees_and_merge_consistency(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(exact.values())
    items = sorted(exact)

    daily = cms_daily(ev, "event_type", "ts", eps=0.001)
    merged_est = cms_estimate(daily, items)

    # CMS guarantee: no undercount; overcount bounded by eps * N
    for it in items:
        assert merged_est[it] >= exact[it]
        assert merged_est[it] <= exact[it] + max(1, int(0.001 * total))

    # merge consistency: union-of-daily == one sketch over everything
    # (identical width/depth/seed -> the count tables add exactly)
    single = cms_daily(
        ev.withColumn("ts", F.lit("2020-01-01").cast("timestamp")),
        "event_type",
        "ts",
        eps=0.001,
    )
    single_est = cms_estimate(single, items)
    assert merged_est == single_est


def test_cms_empty(spark):
    df = spark.createDataFrame([], "event_type string, ts timestamp")
    assert cms_estimate(cms_daily(df, "event_type", "ts"), ["x"]) == {"x": 0}

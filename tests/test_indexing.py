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


def test_epoch_shuffle_permutations(spark):
    """Each epoch yields a contiguous 0..n-1 permutation, different
    epochs give different orders, the same epoch is reproducible, and
    the plan contains no empty-partition-spec Window (the single-task
    global sort the operator exists to avoid)."""
    from cdk_datalake_ingest_upeu_spark.operators.indexing import epoch_shuffle

    df = spark.range(2_000).select(F.col("id").alias("doc_id"))
    try:
        e0 = {r.doc_id: r.epoch_rank for r in epoch_shuffle(
            df, epoch=0, num_partitions=5).collect()}
        e0b = {r.doc_id: r.epoch_rank for r in epoch_shuffle(
            df, epoch=0, num_partitions=3).collect()}
        e1 = {r.doc_id: r.epoch_rank for r in epoch_shuffle(
            df, epoch=1, num_partitions=5).collect()}
        plan = epoch_shuffle(df, epoch=0)._jdf.queryExecution(
        ).executedPlan().toString()
    finally:
        release_scratch()
    assert sorted(e0.values()) == list(range(2_000))
    assert sorted(e1.values()) == list(range(2_000))
    assert e0 == e0b          # layout-independent: same epoch, same order
    assert e0 != e1           # different epoch, different permutation
    assert "Window" not in plan


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


def test_dataset_checksum_order_and_partition_invariant(spark, sf_dir):
    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        dataset_checksum,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    cols = ["doc_id", "text", "lang", "source"]
    base = dataset_checksum(docs, cols).collect()[0]
    shuffled = dataset_checksum(
        docs.repartition(17).orderBy(F.rand(7)), cols
    ).collect()[0]
    assert (base.n_rows, base.checksum) == (shuffled.n_rows, shuffled.checksum)
    # any single-row mutation must change the checksum
    mutated = docs.withColumn(
        "lang",
        F.when(F.col("doc_id") == docs.select(F.min("doc_id")).collect()[0][0],
               F.lit("zz")).otherwise(F.col("lang")),
    )
    assert dataset_checksum(mutated, cols).collect()[0].checksum != base.checksum


def test_ngram_containment_subset_document(spark):
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        ngram_containment_pairs,
    )
    from cdk_datalake_ingest_upeu_spark.operators.scratch import release_scratch

    long_doc = " ".join(f"w{i}" for i in range(200))
    subset = " ".join(f"w{i}" for i in range(40, 80))  # contained run
    other = " ".join(f"x{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, long_doc), (2, subset), (3, other)], "doc_id long, text string"
    )
    try:
        rows = ngram_containment_pairs(df, threshold=0.9).collect()
    finally:
        release_scratch()
    pairs = {(r.id_a, r.id_b): r for r in rows}
    # the subset doc is fully contained in the long doc: max-direction
    # containment 1.0 even though Jaccard is only ~0.19
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r.containment == 1.0
    assert r.cont_b_in_a == 1.0  # B (subset) inside A
    assert r.cont_a_in_b < 0.25
    # the unrelated doc pairs with nothing
    assert not any(3 in p for p in pairs)


def test_hyperplane_sig_null_guard(spark):
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        _hyperplanes,
        _plane_sign_bits,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, None), (3, [1.0])],
        "id long, v array<double>",
    )
    sig = _plane_sign_bits(_hyperplanes(3, 8, 42))
    rows = {r.id: r.s for r in df.select("id", sig("v").alias("s")).collect()}
    assert rows[1] is not None  # valid vector gets a signature
    assert rows[2] is None  # NULL vector propagates NULL, no task failure
    assert rows[3] is None  # wrong-length vector likewise

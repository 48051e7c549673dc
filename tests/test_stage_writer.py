import os

from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.stage_writer import (
    StageTable,
    dedup_latest,
    merge_upsert,
)


def test_dedup_latest_keeps_newest(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01", "old"), (1, "2024-02-01", "new"), (2, "2024-01-15", "only")],
        "id int, updated string, payload string",
    )
    out = dedup_latest(df, ["id"], ["updated"]).orderBy("id").collect()
    assert [(r.id, r.payload) for r in out] == [(1, "new"), (2, "only")]


def test_dedup_latest_noop_without_keys(spark):
    df = spark.createDataFrame([(1,), (1,)], "id int")
    assert dedup_latest(df, [], ["id"]).count() == 2


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
    )
    source = spark.createDataFrame([(2, "B"), (4, "D")], "id int, v string")
    out = {r.id: r.v for r in merge_upsert(target, source, ["id"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_stage_table_overwrite_and_merge(spark, tmp_path):
    path = os.path.join(tmp_path, "tbl")
    stage = StageTable(spark, path)
    assert not stage.exists()

    t0 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    stage.overwrite(t0)
    assert stage.exists()
    assert stage.read().count() == 2

    batch = spark.createDataFrame([(2, "B"), (3, "C")], "id int, v string")
    stage.merge(batch, ["id"])
    out = {r.id: r.v for r in stage.read().collect()}
    assert out == {1: "a", 2: "B", 3: "C"}


def test_stage_table_partitioned_merge_rewrites_only_touched(spark, tmp_path):
    path = os.path.join(tmp_path, "ptbl")
    stage = StageTable(spark, path, partition_columns=["dt"])
    t0 = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")], "id int, v string, dt string"
    )
    stage.overwrite(t0)
    # batch touches only partition d1
    batch = spark.createDataFrame([(2, "B", "d1"), (9, "X", "d1")], "id int, v string, dt string")
    stage.merge(batch, ["id"])
    out = {r.id: (r.v, r.dt) for r in stage.read().collect()}
    assert out == {1: ("a", "d1"), 2: ("B", "d1"), 9: ("X", "d1"), 3: ("c", "d2")}


def test_stage_table_merge_on_missing_table_creates(spark, tmp_path):
    path = os.path.join(tmp_path, "fresh")
    stage = StageTable(spark, path)
    stage.merge(spark.createDataFrame([(1, "a")], "id int, v string"), ["id"])
    assert stage.read().count() == 1


def test_write_empty_preserves_schema(spark, tmp_path):
    path = os.path.join(tmp_path, "empty")
    stage = StageTable(spark, path)
    df = spark.createDataFrame([(1, 2.0)], "id int, v double")
    stage.write_empty(df)
    got = stage.read()
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "v"]


def test_optimize_compacts_files(spark, tmp_path):
    path = os.path.join(tmp_path, "opt")
    stage = StageTable(spark, path)
    stage.overwrite(spark.range(1000).repartition(16).withColumn("v", F.rand(42)))
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    stage.optimize(target_partitions=2)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after <= 2 < n_before
    assert stage.read().count() == 1000


def test_register_creates_catalog_table(spark, tmp_path):
    path = os.path.join(tmp_path, "reg")
    stage = StageTable(spark, path)
    stage.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string"))
    stage.register("reg_stage_tbl")
    try:
        got = spark.sql("SELECT id, name FROM reg_stage_tbl ORDER BY id").collect()
        assert [(r.id, r.name) for r in got] == [(1, "a"), (2, "b")]
        assert spark.catalog.tableExists("reg_stage_tbl")
    finally:
        spark.sql("DROP TABLE IF EXISTS reg_stage_tbl")


def test_dedupe_column_names(spark):
    from cdk_datalake_ingest_upeu_spark.sources.files import dedupe_column_names

    df = spark.createDataFrame([(1, 2, 3, 4)], "a int, b int, c int, d int").toDF(
        "id", "id", "v", "id"
    )
    fixed = dedupe_column_names(df)
    assert fixed.columns == ["id", "id_1", "v", "id_2"]
    # no duplicates -> untouched object
    clean = spark.createDataFrame([(1,)], "x int")
    assert dedupe_column_names(clean) is clean


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import re

    from cdk_datalake_ingest_upeu_spark.sources.files import write_bucketed_table

    left = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    right = spark.range(500).select(F.col("id").alias("k"), (F.col("id") % 7).alias("w"))
    try:
        write_bucketed_table(left, "bk_left", ["k"], num_buckets=4)
        write_bucketed_table(right, "bk_right", ["k"], num_buckets=4)
        # disable broadcast so only bucketing can remove the exchanges
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"Exchange hashpartitioning", plan), plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_parquet_column_bounds_matches_scan():
    """Footer-stats bounds equal a full-scan MIN/MAX (no data read)."""
    import duckdb

    from cdk_datalake_ingest_upeu_spark.sources.files import parquet_column_bounds

    path = "/root/testdata/sf0.001/events.parquet"
    got = parquet_column_bounds(path, "event_id")
    lo, hi = duckdb.sql(
        f"SELECT min(event_id), max(event_id) FROM '{path}'"
    ).fetchone()
    assert got == (lo, hi)
    assert parquet_column_bounds(path, "no_such_column") is None


def test_range_clustered_write_gives_disjoint_file_envelopes(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions -> per-file min/max
    envelopes that don't overlap, so a filtered read can skip files on
    footer stats alone."""
    import glob

    import pyarrow.parquet as pq

    from cdk_datalake_ingest_upeu_spark.sources.files import write_range_clustered

    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    out = str(tmp_path / "clustered")
    write_range_clustered(df, out, ["k"], num_files=8)
    envelopes = []
    for f in glob.glob(out + "/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        st = meta.row_group(0).column(0).statistics
        lo, hi = st.min, st.max
        for rg in range(meta.num_row_groups):
            s = meta.row_group(rg).column(0).statistics
            lo, hi = min(lo, s.min), max(hi, s.max)
        envelopes.append((lo, hi))
    envelopes.sort()
    assert len(envelopes) == 8
    for (a_lo, a_hi), (b_lo, b_hi) in zip(envelopes, envelopes[1:]):
        assert a_hi < b_lo  # strictly disjoint


def test_zorder_write_gives_locality_on_both_columns(spark, tmp_path):
    """Z-order layout: every file covers a small hyper-rectangle, so
    BOTH clustered columns get tight per-file min/max envelopes — a
    lexicographic sort would leave the second column's envelopes
    spanning the full range in every file."""
    import glob

    import pyarrow.parquet as pq

    from cdk_datalake_ingest_upeu_spark.sources.files import write_zorder_clustered

    n = 64_000
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("a"),
        ((F.col("id") * 48271) % 1000).alias("b"),
    )
    out = str(tmp_path / "zorder")
    write_zorder_clustered(df, out, ["a", "b"], num_files=16)

    def envelopes(col):
        spans = []
        for f in glob.glob(out + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(
                md.row_group(i).column(
                    [c for c in range(md.num_columns)
                     if md.row_group(i).column(c).path_in_schema == col][0]
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(
                    [c for c in range(md.num_columns)
                     if md.row_group(i).column(c).path_in_schema == col][0]
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append((lo, hi))
        return spans

    for col in ("a", "b"):
        spans = envelopes(col)
        assert len(spans) >= 8
        avg_width = sum(hi - lo for lo, hi in spans) / len(spans)
        # each file covers a small slab of the 0..999 range on BOTH axes
        assert avg_width < 600, (col, avg_width)
        # a point predicate touches a minority of files
        hits = sum(1 for lo, hi in spans if lo <= 500 <= hi)
        assert hits <= len(spans) // 2, (col, hits)


def test_apply_change_feed_iud_semantics(spark, tmp_path):
    """Latest op per key wins: delete removes, update replaces, insert
    adds, and a U-after-D within one feed resurrects the key."""
    from cdk_datalake_ingest_upeu_spark.operators.stage_writer import StageTable

    stage = StageTable(spark, str(tmp_path / "cdc"))
    stage.overwrite(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
        )
    )
    feed = spark.createDataFrame(
        [
            (1, 0.0, "D", 1),    # delete 1
            (2, 25.0, "U", 1),   # update 2
            (4, 40.0, "I", 1),   # insert 4
            (3, 0.0, "D", 1),    # delete 3 ...
            (3, 33.0, "U", 2),   # ... but a later update wins
        ],
        "k long, v double, op string, seq int",
    )
    stage.apply_change_feed(feed, ["k"], seq_column="seq")
    got = {r.k: r.v for r in stage.read().collect()}
    assert got == {2: 25.0, 3: 33.0, 4: 40.0}


def test_merge_upsert_evolve_schema(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    source = spark.createDataFrame(
        [(2, "B", "x"), (3, "C", "y")], "id int, v string, extra string"
    )
    # default: strict contract, extra source column dropped
    strict = merge_upsert(target, source, ["id"])
    assert strict.columns == ["id", "v"]
    # evolve: column added, untouched target rows null-backfilled
    out = {
        r.id: (r.v, r.extra)
        for r in merge_upsert(target, source, ["id"], evolve_schema=True).collect()
    }
    assert out == {1: ("a", None), 2: ("B", "x"), 3: ("C", "y")}


def test_apply_change_feed_schema_evolution(spark, tmp_path):
    path = os.path.join(tmp_path, "cdc_evo")
    stage = StageTable(spark, path)
    stage.overwrite(
        spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "id int, bal double")
    )
    feed = spark.createDataFrame(
        [
            (2, 25.0, "gold", "U", 1),
            (3, None, None, "D", 1),
            (4, 40.0, "new", "I", 1),
        ],
        "id int, bal double, segment string, op string, seq int",
    )
    stage.apply_change_feed(feed, ["id"], seq_column="seq", evolve_schema=True)
    out = {r.id: (r.bal, r.segment) for r in stage.read().collect()}
    assert out == {1: (10.0, None), 2: (25.0, "gold"), 4: (40.0, "new")}


def test_dpp_join_plans_runtime_pruning(spark, tmp_path):
    """The partitioned-fact x filtered-dim join must carry a dynamic
    partition pruning subquery into the fact scan — the runtime scan
    reduction stage_dpp_pruned_join exists to demonstrate."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("day"), (F.col("id") * 1.0).alias("v")
    )
    path = os.path.join(tmp_path, "fact")
    df.repartition(F.col("day")).write.partitionBy("day").parquet(path)
    fact = spark.read.parquet(path)
    dim = fact.select("day").distinct().filter(F.col("day") % 3 == 0)
    j = fact.join(dim, "day").groupBy("day").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_drop_partitions_is_metadata_only(spark, tmp_path):
    path = os.path.join(tmp_path, "ttl")
    stage = StageTable(spark, path, partition_columns=["day"])
    df = spark.createDataFrame(
        [(i, f"2024-01-{d:02d}") for i in range(40) for d in (5, 10, 15, 20)],
        "id long, day string",
    )
    stage.overwrite(df)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a partition column"):
        stage.drop_partitions("id", before="x")
    dropped = stage.drop_partitions("day", before="2024-01-12")
    assert dropped == 2  # 05 and 10 expired
    # partition-column inference reads the ISO dir names back as dates
    left = sorted(str(r.day) for r in stage.read().select("day").distinct().collect())
    assert left == ["2024-01-15", "2024-01-20"]
    assert stage.read().count() == 80
    # idempotent: nothing left below the cutoff
    assert stage.drop_partitions("day", before="2024-01-12") == 0


def test_stage_table_bloom_index_maintained_by_writes(spark, tmp_path):
    """bloom_index_keys: every write path rebuilds the per-file index,
    and lookup() prunes through the CURRENT generation's index."""
    path = os.path.join(tmp_path, "btbl")
    st = StageTable(spark, path, bloom_index_keys=["id"])
    df = spark.createDataFrame(
        [(i, i * 10.0) for i in range(2000)], "id long, v double"
    )
    st.overwrite(df.repartition(8, "id"))
    idx_path = os.path.join(str(path) + "__bloom", "id")
    assert spark.read.parquet(idx_path).count() > 0

    keys = spark.createDataFrame([(7,), (1999,)], "id long")
    rows, scanned, total = st.lookup(keys, "id")
    got = {r.id: r.v for r in rows.collect()}
    assert got == {7: 70.0, 1999: 19990.0}
    assert 0 < scanned <= total and total >= 8

    # MERGE rewrites the table -> the index must follow the new files
    src = spark.createDataFrame([(7, -1.0), (5000, 5.0)], "id long, v double")
    st.merge(src, ["id"])
    rows2, scanned2, total2 = st.lookup(
        spark.createDataFrame([(7,), (5000,)], "id long"), "id"
    )
    got2 = {r.id: r.v for r in rows2.collect()}
    assert got2 == {7: -1.0, 5000: 5.0}
    assert scanned2 <= total2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not bloom-indexed"):
        st.lookup(keys, "v")
    with _pytest.raises(ValueError, match="parquet-only"):
        StageTable(spark, path, fmt="orc", bloom_index_keys=["id"])


def test_bloom_bounded_delete_rewrites_candidate_files_only(spark, tmp_path):
    """A delete on a bloom-indexed key must rewrite ONLY the candidate
    files the index names (O(candidates), not O(table) — the 100 TB
    takedown shape), splice the index incrementally, and keep lookups
    working against the spliced index."""
    import os as _os

    from cdk_datalake_ingest_upeu_spark.operators.stage_writer import StageTable

    path = str(tmp_path / "bounded")
    st = StageTable(spark, path, fmt="parquet", bloom_index_keys=["k"])
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    st.overwrite(df.repartition(16, "k"))

    def n_files():
        return sum(
            1
            for _r, _d, fs in _os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )

    total_before = n_files()
    assert total_before >= 8
    untouched = {
        _os.path.join(r, f)
        for r, _d, fs in _os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    }
    deletes = spark.createDataFrame([(7,), (1234,)], "k long")
    n_rewritten = st.delete_keys(deletes, ["k"])
    # bounded: strictly fewer files than the table holds (2 keys can
    # occupy at most 2 of 16 files, plus negligible bloom FPs)
    assert 0 < n_rewritten < total_before
    # rows gone, everything else intact
    got = st.read()
    assert got.filter(F.col("k").isin(7, 1234)).count() == 0
    assert got.count() == 1998
    # files NOT holding a delete key were never touched
    still_there = {
        _os.path.join(r, f)
        for r, _d, fs in _os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    }
    assert len(untouched & still_there) == total_before - n_rewritten
    # the spliced index still answers point lookups (no full rebuild)
    rows, scanned, total = st.lookup(
        spark.createDataFrame([(8,), (7,)], "k long"), "k"
    )
    assert {r.k for r in rows.collect()} == {8}
    assert 0 < scanned < total
    # a key absent from every file prunes to zero candidate files
    assert st.delete_keys(
        spark.createDataFrame([(999999,)], "k long"), ["k"]
    ) == 0

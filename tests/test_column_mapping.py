"""Column mapping (rename/drop with stable physical names) — Delta
column mapping's NAME mode re-expressed over the versioned stage
table: renames and drops are zero-IO metadata commits, scans read by
physical name and alias to logical, stats stay valid (physical-keyed),
and a re-added logical name never resurrects dropped bytes."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.versioned import (
    VersionedStageTable,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedStageTable(spark, str(tmp_path / "vt"))


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "k int, v string")


def test_rename_is_zero_io_and_time_travels(spark, table):
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    files_before = table._manifest(0)["files"]
    v = table.rename_column("v", "val")
    m = table._manifest(v)
    # zero IO: the rename commit adds/removes no files
    assert m["files"] == files_before
    assert table.read().columns == ["k", "val"]
    assert _rows(table.read()) == [(1, "a"), (2, "b")]
    # time travel: the pre-rename version still reads under OLD names
    assert table.read(0).columns == ["k", "v"]
    assert _rows(table.read(0)) == [(1, "a"), (2, "b")]
    # the op is in history and the protocol gates pre-mapping engines
    assert table.history()[-1]["op"] == "rename_column"
    proto = table.protocol()
    assert "column-mapping" in proto["reader"]
    assert "column-mapping" in proto["writer"]


def test_rename_then_write_lands_same_physical_name(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    table.rename_column("v", "val")
    table.append(
        spark.createDataFrame([(2, "b")], "k int, val string")
    )
    assert _rows(table.read()) == [(1, "a"), (2, "b")]
    # on disk, BOTH files carry the stable physical name 'v'
    import pyarrow.parquet as pq

    for rel in table._manifest(table.latest_version())["files"]:
        names = pq.read_schema(table._abs(rel)).names
        assert "v" in names and "val" not in names


def test_rename_keeps_stats_pruning_sound_and_sharp(spark, table):
    lo = spark.createDataFrame([(i, "lo") for i in range(10)], "k int, v string")
    hi = spark.createDataFrame([(i, "hi") for i in range(1000, 1010)], "k int, v string")
    table.overwrite(lo.coalesce(1))
    table.append(hi.coalesce(1))
    table.rename_column("k", "key")
    # lookup on the NEW logical name: correct rows, and the manifest
    # bounds (keyed by the stable physical name) still prune
    got = table.lookup("key >= 1000")
    assert got.count() == 10
    m = table._manifest(table.latest_version())
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        _physical_names,
        _stat_columns,
        prune_candidate_files,
    )
    import json as _json
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(_json.loads(m["schema"]))
    cands = prune_candidate_files(
        m["files"], m.get("stats") or {}, "key >= 1000",
        stat_cols=set(_stat_columns(schema)),
        rename=_physical_names(schema),
    )
    assert len(cands) == 1  # the lo file was pruned via old-name stats


def test_rename_key_then_merge_and_delete(spark, table):
    table.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    table.rename_column("k", "id")
    table.merge(
        spark.createDataFrame([(2, "B"), (4, "d")], "id int, v string"),
        ["id"],
    )
    assert _rows(table.read()) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]
    table.delete("id <= 1")
    assert _rows(table.read()) == [(2, "B"), (3, "c"), (4, "d")]
    # DV delete through the mapping too
    table.delete("id = 3", mode="dv")
    assert _rows(table.read()) == [(2, "B"), (4, "d")]
    # and compact purges the mask under the mapped schema
    table.compact()
    assert _rows(table.read()) == [(2, "B"), (4, "d")]


def test_rename_validation(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="no column"):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("v", "k")
    with pytest.raises(ValueError, match="invalid column name"):
        table.rename_column("v", "bad name")
    # a rename under a constraint REWRITES the expression (no raise)
    table.add_constraint("k_pos", "k > 0")
    assert table.rename_column("v", "val") > 0


def test_drop_column_and_no_resurrection_on_readd(spark, table):
    table.overwrite(_df(spark, [(1, "secret1"), (2, "secret2")]))
    v = table.drop_column("v")
    assert table.read().columns == ["k"]
    assert _rows(table.read()) == [(1,), (2,)]
    # pre-drop version still shows the column (time travel)
    assert _rows(table.read(v - 1)) == [(1, "secret1"), (2, "secret2")]
    # re-adding the same logical name must NOT resurrect dropped bytes
    table.append(
        spark.createDataFrame([(3, "fresh")], "k int, v string"),
        merge_schema=True,
    )
    assert _rows(table.read()) == [(1, None), (2, None), (3, "fresh")]
    assert table.history()[-2]["op"] == "drop_column"


def test_drop_validation(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="no column"):
        table.drop_column("nope")
    table.add_constraint("v_nonempty", "length(v) > 0")
    with pytest.raises(ValueError, match="v_nonempty"):
        table.drop_column("v")
    table.drop_constraint("v_nonempty")
    table.drop_column("v")
    with pytest.raises(ValueError, match="only column"):
        table.drop_column("k")


def test_changes_across_rename_is_row_exact(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))        # v0
    table.rename_column("v", "val")                 # v1 (no row changes)
    table.append(
        spark.createDataFrame([(2, "b")], "k int, val string")
    )                                               # v2
    # the rename contributes zero feed rows; the append exactly its batch
    feed = table.changes(0, 2)
    assert feed.columns[:2] == ["k", "val"]
    assert _rows(feed) == [(2, "b", "insert")]
    assert table.changes(0, 1).count() == 0


def test_rename_survives_checkpoint_roundtrip(spark, tmp_path):
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    t.overwrite(_df(spark, [(1, "a")]))
    t.rename_column("v", "val")
    t.append(spark.createDataFrame([(2, "b")], "k int, val string"))
    t.append(spark.createDataFrame([(3, "c")], "k int, val string"))
    assert t.checkpoints()  # interval hit: resolution anchors here
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    assert fresh.read().columns == ["k", "val"]
    assert _rows(fresh.read()) == [(1, "a"), (2, "b"), (3, "c")]
    # the mapped schema survived the checkpoint: a further rename
    # still sees the frozen physical names
    fresh.rename_column("val", "value")
    assert _rows(fresh.read()) == [(1, "a"), (2, "b"), (3, "c")]
    assert fresh.read().columns == ["k", "value"]


def test_rename_then_zorder_clusters_on_new_name(spark, table):
    rows = [(i % 7, f"s{i}") for i in range(100)]
    table.overwrite(_df(spark, rows).repartition(4))
    table.rename_column("k", "key")
    v = table.compact(zorder_by=["key"], target_files=2)
    assert table._manifest(v)["metrics"]["zorder_by"] == ["key"]
    assert table.read().count() == 100
    assert table.lookup("key = 3").count() == len(
        [r for r in rows if r[0] == 3]
    )


def test_stale_name_predicate_raises_not_silently_empty(spark, table):
    """Review r12 #1: a predicate naming a column OUTSIDE the logical
    schema (here: a DROPPED column, whose physical key still sits in
    every old file's stats dict) must surface as an analysis error
    from the scan filter — pruning may not translate it through the
    mapping's key space and silently return an empty result."""
    lo = spark.createDataFrame(
        [(i, "x") for i in range(10)], "a int, v string"
    )
    table.overwrite(lo.coalesce(1))
    table.drop_column("a")
    m = table._manifest(table.latest_version())
    # the dropped column's bounds are still in the per-file stats dict
    assert any("a" in (m["stats"].get(f) or {}) for f in m["files"])
    from pyspark.errors import AnalysisException

    # pre-fix: 'a > 100' matched the stats key 'a', excluded the file,
    # and lookup returned EMPTY; now the conjunct contributes no
    # pruning and the filter raises like any unknown column
    with pytest.raises(AnalysisException):
        table.lookup("a > 100").count()
    with pytest.raises(AnalysisException):
        table.delete("a > 100")
    # a STALE renamed name keeps Spark's own resolve-through-project
    # semantics (same physical column, same data) — consistent, and
    # critically never a pruning-fabricated empty
    t2 = VersionedStageTable(spark, table.path + "2")
    t2.overwrite(lo.coalesce(1))
    t2.rename_column("a", "c")
    assert t2.lookup("c >= 0").count() == 10
    assert t2.lookup("a >= 0").count() in (0, 10)  # resolved or raises
    assert t2.lookup("a >= 0").count() == t2.lookup("c >= 0").count()


def test_user_schema_cannot_smuggle_physical_name(spark, table):
    """Review r12 #2: a df whose schema carries the reserved
    physical_name metadata key (e.g. round-tripped from a real
    column-mapped Delta table) must NOT activate mapping — the files
    are written under logical names, so honoring the foreign physical
    names would NULL-backfill real data."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType(), True),
            T.StructField(
                "v", T.StringType(), True, {"physical_name": "col-alien"}
            ),
        ]
    )
    df = spark.createDataFrame([(1, "real"), (2, "data")], schema)
    table.overwrite(df)
    assert _rows(table.read()) == [(1, "real"), (2, "data")]  # not NULL
    assert "column-mapping" not in (
        table.protocol().get("reader") or []
    )
    # append with merge_schema smuggling the key on a NEW column
    df2 = spark.createDataFrame(
        [(3, "more", 7.5)],
        T.StructType(
            schema.fields
            + [
                T.StructField(
                    "w", T.DoubleType(), True, {"physical_name": "col-bad"}
                )
            ]
        ),
    )
    table.append(df2, merge_schema=True)
    got = sorted(
        tuple(r) for r in table.read().select("k", "v", "w").collect()
    )
    assert got == [(1, "real", None), (2, "data", None), (3, "more", 7.5)]


def test_lazy_stats_survive_checkpoint_vacuumed_under_holder(
    spark, tmp_path
):
    """Review r12 #3: a holder that resolved its snapshot off a
    checkpoint whose stats it never read must stay CORRECT (just
    unpruned) if another writer vacuums that checkpoint away before
    the deferred load — degraded, recorded, never a crash."""
    import os

    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=2
    )
    lo = spark.createDataFrame(
        [(i, "lo") for i in range(10)], "k int, v string"
    )
    hi = spark.createDataFrame(
        [(i, "hi") for i in range(1000, 1010)], "k int, v string"
    )
    t.overwrite(lo.coalesce(1))
    t.append(hi.coalesce(1))  # v1... v2 checkpoints at interval 2
    t.append(spark.createDataFrame([(77, "m")], "k int, v string"))
    assert 2 in t.checkpoints()
    holder = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=2
    )
    m = holder._manifest(2)  # lazy stats, column unread
    os.remove(holder._checkpoint_path(2))  # "vacuum" races the holder
    got = holder.lookup("k >= 1000", version=2)
    assert got.count() == 10  # correct, merely unpruned
    assert holder._last_stats_load_error is not None
    assert m is not None


def test_rename_onto_reused_name_never_misclusters(spark, table):
    """Review r12 #4: zorder on k, rename k->key, rename v->k — the
    clustering anchor records PHYSICAL names, so the reused logical
    name must not false-match: incremental zorder on the new 'k'
    reclusters in full, and eager-write clustering does not fire on
    the wrong column."""
    rows = [(i % 7, f"s{i}") for i in range(60)]
    table.overwrite(_df(spark, rows).repartition(3))
    v_z = table.compact(zorder_by=["k"], target_files=2)
    assert table._manifest(v_z)["metrics"]["zorder_by_physical"] == ["k"]
    table.rename_column("k", "key")
    table.rename_column("v", "k")  # reuse the old logical name
    # eager-write clustering keys on the PHYSICAL anchor: a batch
    # carrying only the REUSED logical name 'k' (the former v — a
    # string) must NOT be clustered on it (pre-fix it was); a batch
    # carrying 'key' (the physical anchor's current logical) is.
    batch_wrong = spark.createDataFrame([("zz",)], "k string")
    v_a = table.append(batch_wrong, cluster=True, merge_schema=True)
    assert "clustered" not in (table._manifest(v_a).get("metrics") or {})
    batch_right = spark.createDataFrame([(9, "zz")], "key int, k string")
    v_b = table.append(batch_right, cluster=True)
    assert (table._manifest(v_b)["metrics"] or {}).get("clustered")
    # incremental zorder on the REUSED name must not adopt the stale
    # anchor: it clusters the full snapshot (anchor physical differs)
    v2 = table.compact(zorder_by=["k"], incremental=True)
    m2 = table._manifest(v2)
    assert m2["metrics"]["incremental"] is False
    assert m2["metrics"]["files_carried"] == 0
    # and a follow-up incremental pass against the NEW anchor is exact:
    # it clusters exactly the files appended since the full rewrite
    v_app = table.append(
        spark.createDataFrame([(10, "tail")], "key int, k string")
    )
    tail = set(table._manifest(v_app)["files"]) - set(m2["files"])
    v3 = table.compact(zorder_by=["k"], incremental=True)
    m3 = table._manifest(v3)
    assert m3["metrics"]["incremental"] is True
    assert m3["metrics"]["files_clustered"] == len(tail)
    assert set(m2["files"]) <= set(m3["files"])  # base carried by name
    assert table.read().count() == 63


def test_rename_rewrites_check_constraints(spark, table):
    """ALTER RENAME under a CHECK constraint: the expression is
    rewritten to the new logical name in the same commit (Delta's
    column-mapping behavior) — the constraint keeps enforcing with no
    drop/re-add, string literals and function names survive verbatim,
    and per-file stats stay keyed by the untouched physical name."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        ConstraintViolationError,
    )

    table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    table.add_constraint("k_pos", "k > 0 AND coalesce(k, 1) < 100")
    table.add_constraint("v_lit", "v != 'k'")  # 'k' here is a VALUE
    v = table.rename_column("k", "key")
    cons = table._manifest(v)["constraints"]
    assert cons["k_pos"] == "key > 0 AND coalesce(key, 1) < 100"
    assert cons["v_lit"] == "v != 'k'"  # literal untouched
    # the rewritten constraint still ENFORCES post-rename...
    with pytest.raises(ConstraintViolationError):
        table.append(
            spark.createDataFrame([(-5, "x")], "key int, v string")
        )
    table.append(spark.createDataFrame([(3, "c")], "key int, v string"))
    assert sorted(r["key"] for r in table.read().collect()) == [1, 2, 3]
    # ...and stats-pruned reads still bind (stats keyed physical)
    assert _rows(table.lookup("key = 3")) == [(3, "c")]
    # backtick-quoted references rewrite by content too
    table.add_constraint("kq", "`key` >= 0")
    v2 = table.rename_column("key", "id")
    assert table._manifest(v2)["constraints"]["kq"] == "`id` >= 0"
    assert table._manifest(v2)["constraints"]["k_pos"] == (
        "id > 0 AND coalesce(id, 1) < 100"
    )


def test_rename_refuses_unrewritable_constraint_exprs(spark, table):
    """Fail-closed residue: expressions where an occurrence of the old
    name may NOT be a column reference (lambda bound variables), or
    where the rewrite would capture an existing identifier, still
    raise — with the constraint named in the error."""
    table.overwrite(
        spark.createDataFrame([([1, 2], 1)], "arr array<int>, k int")
    )
    # lambda: the 'k' inside could be the bound variable, refuse
    table.add_constraint("lam", "exists(arr, k -> k > 0)")
    with pytest.raises(ValueError, match="lam"):
        table.rename_column("k", "key")
    table.drop_constraint("lam")
    # sanity: without the lambda the same rename rewrites fine
    table.add_constraint("k_pos", "k > 0")
    assert table.rename_column("k", "key") > 0
    assert (
        table._manifest(table.latest_version())["constraints"]["k_pos"]
        == "key > 0"
    )


def test_rewrite_skips_backslash_escaped_literals(spark, table):
    """Review finding: Spark SQL string literals support backslash
    escapes; the rewriter must not end the literal at an escaped quote
    and rewrite its tail as identifiers."""
    rw = table._rewrite_constraint_expr
    assert rw(r"v != 'it\'s k'", "k", "key") == r"v != 'it\'s k'"
    assert rw(r"k > 0 AND v != 'no\'t k'", "k", "key") == (
        r"key > 0 AND v != 'no\'t k'"
    )
    assert rw("v != 'unterminated", "k", "key") is None


def test_rename_detects_case_variant_constraint_refs(spark, table):
    """ADVICE r13: Spark resolves column references case-insensitively,
    so a constraint written 'K > 0' binds column 'k'. The detector must
    find it on rename (else post-rename appends fail unresolved), and
    the rewriter fails CLOSED on the case-variant occurrence rather
    than silently rewriting text the user didn't write."""
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    table.add_constraint("upper_ref", "K > 0")
    with pytest.raises(ValueError, match="upper_ref"):
        table.rename_column("k", "key")
    # dropping the variant-case constraint unblocks the rename
    table.drop_constraint("upper_ref")
    table.add_constraint("exact_ref", "k > 0")
    v = table.rename_column("k", "key")
    assert table._manifest(v)["constraints"]["exact_ref"] == "key > 0"
    # capture hazard is case-insensitive too: an identifier KEY in any
    # case would collide with the new name under Spark resolution
    rw = table._rewrite_constraint_expr
    assert rw("k > 0 AND KEY2 > 0", "k", "key2") is None
    assert rw("`K` > 0", "k", "key") is None  # quoted case-variant ref
    # struct-member access in a case variant is NOT a column reference
    assert rw("s.K > 0", "k", "key") == "s.K > 0"

"""VersionedStageTable: commit log, time travel, COW merge, vacuum."""

import json
import os

import pytest
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.versioned import (
    VersionedStageTable,
    VersionNotFoundError,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedStageTable(spark, str(tmp_path / "vt"))


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "k int, v string")


def test_overwrite_append_versions(spark, table):
    v0 = table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    v1 = table.append(_df(spark, [(3, "c")]))
    assert (v0, v1) == (0, 1)
    assert _rows(table.read(0)) == [(1, "a"), (2, "b")]
    assert _rows(table.read(1)) == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(table.read()) == _rows(table.read(1))
    assert [h["op"] for h in table.history()] == ["overwrite", "append"]


def test_merge_is_upsert_and_cow(spark, table):
    table.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    f0 = set(table._manifest(0)["files"])
    table.merge(_df(spark, [(2, "B"), (4, "d")]), ["k"])
    assert _rows(table.read()) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]
    # v0 still readable exactly as committed (time travel across a merge)
    assert _rows(table.read(0)) == [(1, "a"), (2, "b"), (3, "c")]
    # COW: files of v0 not containing key 2 carry over by name
    f1 = set(table._manifest(1)["files"])
    untouched = {
        f for f in f0
        if not _file_has_key(spark, table, f, 2)
    }
    assert untouched and untouched <= f1


def _file_has_key(spark, table, rel, key):
    df = spark.read.parquet(table._abs(rel))
    return df.filter(F.col("k") == key).limit(1).count() > 0


def test_merge_pure_insert_carries_all_files(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    f0 = set(table._manifest(0)["files"])
    table.merge(_df(spark, [(9, "z")]), ["k"])
    assert f0 <= set(table._manifest(1)["files"])
    assert _rows(table.read()) == [(1, "a"), (9, "z")]


def test_merge_dedups_source_batch(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    table.merge(_df(spark, [(1, "x"), (1, "x"), (2, "y")]), ["k"])
    got = _rows(table.read())
    assert [t[0] for t in got] == [1, 2]


def test_vacuum_retention(spark, table):
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    table.overwrite(_df(spark, [(3, "c")]))
    table.append(_df(spark, [(4, "d")]))
    out = table.vacuum(retain_last=2, data_grace_seconds=0.0)
    assert out["versions_dropped"] == [0]
    assert out["files_deleted"] > 0  # v0's files referenced nowhere else
    # retained versions still read intact
    assert _rows(table.read(1)) == [(3, "c")]
    assert _rows(table.read(2)) == [(3, "c"), (4, "d")]
    with pytest.raises(VersionNotFoundError):
        table.read(0)
    # every file on disk is referenced by a retained manifest
    on_disk = set()
    for sub in os.listdir(table.data_dir):
        for fn in os.listdir(os.path.join(table.data_dir, sub)):
            if fn.endswith(".parquet"):
                on_disk.add(os.path.join("data", sub, fn))
    referenced = set(table._manifest(1)["files"]) | set(
        table._manifest(2)["files"]
    )
    assert on_disk == referenced


def test_vacuum_keeps_shared_files(spark, table):
    """An append's carried-over files are referenced by BOTH versions;
    vacuuming the older one must not delete them."""
    table.overwrite(_df(spark, [(1, "a")]))
    table.append(_df(spark, [(2, "b")]))
    table.vacuum(retain_last=1, data_grace_seconds=0.0)
    assert _rows(table.read()) == [(1, "a"), (2, "b")]


def test_changes_append_is_insert_only(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    table.append(_df(spark, [(2, "b"), (3, "c")]))
    got = sorted(
        (r["_change_type"], r["k"]) for r in table.changes(0, 1).collect()
    )
    assert got == [("insert", 2), ("insert", 3)]


def test_changes_merge_update_is_delete_insert_pair(spark, table):
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    table.merge(_df(spark, [(2, "B"), (3, "c")]), ["k"])
    got = sorted(
        (r["_change_type"], r["k"], r["v"])
        for r in table.changes(0, 1).collect()
    )
    # row 1 was rewritten UNCHANGED into the merge's new files (it
    # shared a file with key 2) or carried over — either way exceptAll
    # must cancel it out of the feed
    assert got == [
        ("delete", 2, "b"),
        ("insert", 2, "B"),
        ("insert", 3, "c"),
    ]


def test_changes_across_overwrite(spark, table):
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    table.overwrite(_df(spark, [(2, "b"), (3, "c")]))
    got = sorted(
        (r["_change_type"], r["k"]) for r in table.changes(0, 1).collect()
    )
    # (2,'b') exists in both snapshots but in different files; the
    # multiset difference cancels it
    assert got == [("delete", 1), ("insert", 3)]


def test_changes_rejects_bad_version_order(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    table.append(_df(spark, [(2, "b")]))
    with pytest.raises(ValueError):
        table.changes(1, 1)
    with pytest.raises(ValueError):
        table.changes(1, 0)


def test_compact_bins_small_files_and_preserves_content(spark, table):
    table.overwrite(_df(spark, [(1, "a")]).repartition(4))
    table.append(_df(spark, [(2, "b")]).repartition(3))
    before = _rows(table.read())
    n_files_before = len(table._manifest(table.latest_version())["files"])
    v = table.compact()
    m = table._manifest(v)
    assert m["op"] == "compact"
    assert len(m["files"]) < n_files_before
    assert _rows(table.read()) == before
    # compaction is logical-identity: the change feed across it is empty
    assert table.changes(v - 1, v).count() == 0
    # prior versions still readable (time travel across OPTIMIZE)
    assert _rows(table.read(1)) == before


def test_compact_carries_large_files_by_name(spark, table):
    table.overwrite(_df(spark, [(i, "x") for i in range(500)]).coalesce(1))
    big = set(table._manifest(0)["files"])
    table.append(_df(spark, [(900, "s")]).repartition(2))
    v = table.compact(max_file_bytes=os.path.getsize(
        table._abs(next(iter(big)))
    ))
    m = table._manifest(v)
    assert big <= set(m["files"])  # the large file was not rewritten


def test_compact_noop_below_two_small_files(spark, table):
    table.overwrite(_df(spark, [(1, "a")]).coalesce(1))
    assert table.compact() == 0  # nothing to bin: version unchanged
    assert [h["op"] for h in table.history()] == ["overwrite"]


def test_empty_table_read_has_schema(spark, table):
    table.overwrite(_df(spark, []).limit(0))
    df = table.read()
    assert df.columns == ["k", "v"] and df.count() == 0


def test_read_missing_version_raises(spark, table):
    with pytest.raises(VersionNotFoundError):
        table.read()
    table.overwrite(_df(spark, [(1, "a")]))
    with pytest.raises(VersionNotFoundError):
        table.read(7)


def test_restore_rolls_back_without_data_io(spark, table):
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    table.merge(_df(spark, [(2, "B"), (3, "c")]), ["k"])
    v = table.restore(0)
    assert v == 2
    assert _rows(table.read()) == [(1, "a"), (2, "b")]
    # pure bookkeeping: the restore's manifest references v0's files
    assert table._manifest(2)["files"] == table._manifest(0)["files"]
    # the rolled-back state stays readable (restore appends to history)
    assert _rows(table.read(1)) == [(1, "a"), (2, "B"), (3, "c")]
    # the change feed across the restore is the inverse of the merge's
    m = sorted((r["_change_type"], r["k"]) for r in table.changes(0, 1).collect())
    rb = sorted((r["_change_type"], r["k"]) for r in table.changes(1, 2).collect())
    flip = {"insert": "delete", "delete": "insert"}
    assert sorted((flip[t], k) for t, k in m) == rb


def test_restore_past_vacuum_refuses(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    table.overwrite(_df(spark, [(2, "b")]))
    table.vacuum(retain_last=1, data_grace_seconds=0.0)
    with pytest.raises(VersionNotFoundError):
        table.restore(0)


def test_append_merge_schema_evolves_and_backfills_null(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    evolved = spark.createDataFrame(
        [(2, "b", "S1")], "k int, v string, seg string"
    )
    with pytest.raises(ValueError):
        table.append(evolved)  # schema drift must be explicit
    table.append(evolved, merge_schema=True)
    got = sorted(tuple(r) for r in table.read().collect())
    assert got == [(1, "a", None), (2, "b", "S1")]
    # pre-evolution version still reads with the ORIGINAL schema
    assert table.read(0).columns == ["k", "v"]
    assert table.read(1).columns == ["k", "v", "seg"]


def test_append_refuses_type_change(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    # int -> double is a LOSSLESS WIDENING since r12: with merge_schema
    # it evolves the table type instead of raising...
    retyped = spark.createDataFrame([(2.5, "b")], "k double, v string")
    table.append(retyped, merge_schema=True)
    assert dict(table.read().dtypes)["k"] == "double"
    # ...but a non-widening change still refuses, with or without
    # merge_schema (string<->numeric, and any NARROWING)
    with pytest.raises(ValueError, match="type change"):
        table.append(
            spark.createDataFrame([("x", "c")], "k string, v string"),
            merge_schema=True,
        )
    with pytest.raises(ValueError, match="type change"):
        table.append(
            spark.createDataFrame([("d", 7)], "v string, k long"),
            merge_schema=True,
        )  # double -> long would narrow


def test_append_epoch_idempotent(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    v1 = table.append(_df(spark, [(2, "b")]), epoch=7)
    v_retry = table.append(_df(spark, [(2, "b")]), epoch=7)
    assert v1 == v_retry == 1
    assert _rows(table.read()) == [(1, "a"), (2, "b")]  # no double-land
    v2 = table.append(_df(spark, [(3, "c")]), epoch=8)
    assert v2 == 2


def test_first_epoch_append_bootstraps_table(spark, table):
    v0 = table.append(_df(spark, [(1, "a")]), epoch=0)
    assert v0 == 0 and table._manifest(0)["epoch"] == 0
    assert table.append(_df(spark, [(1, "a")]), epoch=0) == 0


def test_concurrent_commit_loser_detected(spark, table):
    """Two writers racing for the same version: the second commit of
    version N raises ConcurrentCommitError instead of clobbering the
    winner; retrying after a log re-read lands on N+1."""
    import json as _json
    import os as _os

    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        ConcurrentCommitError,
    )

    table.overwrite(_df(spark, [(1, "a")]))
    files = table._write_files(_df(spark, [(2, "b")]), 99)
    schema = table._manifest(0)["schema"]
    # freeze the loser's log view at [0], then land the winner's
    # version-1 manifest — the exact read-compute-commit race window
    real_versions = table.versions
    table.versions = lambda: [0]
    winner = {"version": 1, "op": "append",
              "files": table._manifest(0)["files"], "schema": schema}
    with open(_os.path.join(table.log_dir, "00000001.json"), "w") as fh:
        _json.dump(winner, fh)
    with pytest.raises(ConcurrentCommitError):
        table._commit("append", add=files, schema_json=schema)
    # loser retries after re-reading the log: next version is 2
    table.versions = real_versions
    v = table._commit("append", add=files, schema_json=schema)
    assert v == 2
    assert table._manifest(1)["op"] == "append"  # winner untouched


def test_versioned_model_based_random_ops(spark, tmp_path):
    """Model-based check: a random op sequence against a pure-Python
    dict model — after EVERY commit, every still-live version must read
    back exactly what the model says it held (time travel is the
    versioned table's core promise; this catches manifest bookkeeping
    bugs no single-op test can)."""
    import random

    rng = random.Random(20260815)
    # checkpoint_interval=3: the random walk crosses several checkpoint
    # boundaries, so snapshot resolution (anchor + delta suffix) and
    # deletion-vector carry-through are both exercised mid-sequence
    t = VersionedStageTable(
        spark, str(tmp_path / "model_vt"), checkpoint_interval=3
    )
    history: list[dict[int, str]] = []  # model state per version
    live: dict[int, int] = {}  # table version -> history index

    def _frame(d: dict[int, str]):
        return spark.createDataFrame(sorted(d.items()), "k int, v string")

    state: dict[int, str] = {}
    for step in range(18):
        op = rng.choice(
            ["overwrite", "append", "merge", "merge_resolve", "compact",
             "zorder", "restore", "delete", "delete_dv", "consolidate_dv",
             "delete_keys", "cluster_append", "zorder_incremental"]
        )
        if not history and op != "overwrite":
            op = "overwrite"
        if op == "overwrite":
            state = {rng.randrange(20): "o%d" % step for _ in range(3)}
            v = t.overwrite(_frame(state))
        elif op == "append":
            batch = {k: "a%d" % step for k in range(20 + step, 23 + step)}
            state = {**state, **batch}
            v = t.append(_frame(batch))
        elif op == "cluster_append":
            # logically identical to append — file LAYOUT changes (the
            # batch lands range-partitioned on the active cluster key,
            # a plain write when the table was never zordered), which
            # the model cannot tell apart: the property under test
            batch = {k: "ca%d" % step for k in range(40 + step, 44 + step)}
            state = {**state, **batch}
            v = t.append(_frame(batch), cluster=True, cluster_files=2)
        elif op == "delete_keys":
            ks = sorted({rng.randrange(30) for _ in range(3)})
            state = {k: vv for k, vv in state.items() if k not in ks}
            v = t.delete_keys(
                spark.createDataFrame([(k,) for k in ks], "k int"), ["k"]
            )
            if v in live:  # no key present: no new commit
                continue
        elif op == "zorder_incremental":
            v = t.compact(zorder_by=["k"], target_files=2,
                          incremental=True)
            if v in live:  # clean tail: no-op
                continue
        elif op == "merge":
            src = {rng.randrange(25): "m%d" % step for _ in range(3)}
            state = {**state, **src}
            v = t.merge(_frame(src), ["k"])
        elif op == "merge_resolve":
            # two distinct rows per key, resolved latest-wins on v —
            # the model takes the lexically LAST value per key, exactly
            # resolve_by's desc_nulls_last contract
            ks = sorted({rng.randrange(25) for _ in range(2)})
            lo2 = {k: "r%d_a" % step for k in ks}
            hi2 = {k: "r%d_b" % step for k in ks}
            both = spark.createDataFrame(
                sorted(lo2.items()) + sorted(hi2.items()),
                "k int, v string",
            )
            v = t.merge(both, ["k"], resolve_by=["v"])
            state = {**state, **{k: max(lo2[k], hi2[k]) for k in ks}}
        elif op == "delete":
            cut = rng.randrange(25)
            state = {k: vv for k, vv in state.items() if not (k > cut)}
            v = t.delete(f"k > {cut}")
            if v in live:  # no row matched: no new commit
                continue
        elif op == "delete_dv":
            # merge-on-read: same logical semantics as COW delete, but
            # zero data files rewritten — the model cannot tell the
            # difference, which is exactly the property under test
            lo = rng.randrange(25)
            state = {
                k: vv for k, vv in state.items()
                if not (lo <= k < lo + 4)
            }
            files_before = t._manifest(t.latest_version())["files"]
            v = t.delete(f"k >= {lo} AND k < {lo + 4}", mode="dv")
            if v in live:  # no row matched: no new commit
                continue
            assert t._manifest(v)["files"] == files_before
        elif op == "consolidate_dv":
            # merges accreted sidecars into one; logically invisible —
            # the model state is unchanged, which is the property
            v = t.consolidate_dv()
            if v in live:  # fewer than 2 sidecars: no-op
                continue
        elif op == "compact":
            v = t.compact(max_file_bytes=1 << 30)
            if v in live:  # no-op compact (fewer than 2 small files)
                continue
        elif op == "zorder":
            v = t.compact(zorder_by=["k"], target_files=2)
            if v in live:  # empty table: no-op
                continue
        else:
            target = rng.choice(sorted(live))
            state = dict(history[live[target]])
            v = t.restore(target)
        history.append(dict(state))
        live[v] = len(history) - 1
        # every live version still reads exactly its model state
        for ver, hidx in live.items():
            got = {r["k"]: r["v"] for r in t.read(ver).collect()}
            assert got == history[hidx], (step, op, ver)
    # forced consolidate before the vacuum: merging whatever sidecars
    # the walk accreted must be logically invisible to every live
    # version (the random draws alone may skip the op for some seeds)
    v = t.consolidate_dv()
    if v not in live:
        history.append(dict(state))
        live[v] = len(history) - 1
        for ver, hidx in live.items():
            got = {r["k"]: r["v"] for r in t.read(ver).collect()}
            assert got == history[hidx], ("consolidate_dv", ver)
    # vacuum to the last two versions: dropped ones must refuse reads,
    # survivors must still match the model
    keep = sorted(live)[-2:]
    t.vacuum(retain_last=2, data_grace_seconds=0.0)
    for ver in live:
        if ver in keep:
            got = {r["k"]: r["v"] for r in t.read(ver).collect()}
            assert got == history[live[ver]]
        else:
            with pytest.raises(VersionNotFoundError):
                t.read(ver)


def test_timestamp_as_of_resolution(spark, table):
    """timestampAsOf picks the latest commit at-or-before the instant;
    asking before the earliest retained commit refuses (Delta's
    past-retention behavior). Commit instants injected for determinism."""
    files0 = table._write_files(_df(spark, [(1, "a")]), 0)
    table._commit("overwrite", add=files0,
                  schema_json=_df(spark, [(1, "a")]).schema.json(),
                  committed_at=100.0)
    files1 = table._write_files(_df(spark, [(2, "b")]), 1)
    table._commit("append", add=files1,
                  schema_json=_df(spark, [(2, "b")]).schema.json(),
                  committed_at=200.0)
    assert table.version_at(150.0) == 0
    assert table.version_at(200.0) == 1
    assert _rows(table.read(timestamp_as_of=150.0)) == [(1, "a")]
    assert _rows(table.read(timestamp_as_of=999.0)) == [(1, "a"), (2, "b")]
    with pytest.raises(VersionNotFoundError):
        table.version_at(99.9)
    with pytest.raises(ValueError):
        table.read(0, timestamp_as_of=150.0)


def test_leaked_tmp_manifest_does_not_poison_log(spark, table):
    """A process dying between os.link and the finally-os.remove leaves
    .tmp-<uuid>.json in _log/; the log listing must ignore it (r7 bug:
    int('.tmp-...') poisoned every subsequent read/commit/vacuum)."""
    table.overwrite(_df(spark, [(1, "a")]))
    leaked = os.path.join(table.log_dir, ".tmp-deadbeef.json")
    with open(leaked, "w", encoding="utf-8") as fh:
        fh.write("{}")
    assert table.versions() == [0]
    v1 = table.append(_df(spark, [(2, "b")]))
    assert v1 == 1
    assert _rows(table.read()) == [(1, "a"), (2, "b")]
    table.vacuum(retain_last=1, data_grace_seconds=0.0)
    assert table.versions() == [1]


def test_merge_raises_on_multiple_distinct_rows_per_key(spark, table):
    """Two DISTINCT source rows for one key is Delta MERGE's
    multiple-match error — keeping an arbitrary one would make table
    content nondeterministic. Full-row duplicates remain benign."""
    table.overwrite(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="multiple distinct rows"):
        table.merge(_df(spark, [(1, "x"), (1, "y")]), ["k"])
    # table unchanged: the failed merge committed nothing
    assert table.versions() == [0]
    assert _rows(table.read()) == [(1, "a")]


def test_merge_validates_source_schema(spark, table):
    """merge applies append's column-compatibility check: extra or
    missing source columns raise instead of silently vanishing under
    the previous manifest's schema; so does a type change."""
    table.overwrite(_df(spark, [(1, "a")]))
    extra = spark.createDataFrame([(9, "z", 1.5)], "k int, v string, x double")
    with pytest.raises(ValueError, match="columns"):
        table.merge(extra, ["k"])
    missing = spark.createDataFrame([(9,)], "k int")
    with pytest.raises(ValueError, match="columns"):
        table.merge(missing, ["k"])
    retyped = spark.createDataFrame([(9, 7)], "k int, v int")
    with pytest.raises(ValueError, match="type"):
        table.merge(retyped, ["k"])
    assert table.versions() == [0]


def test_two_writer_interleaved_commit_race(spark, tmp_path):
    """Real contention on the os.link commit point: two threads race
    every version; exactly one wins each, the loser retries on the next
    version, and the final table holds every writer's rows exactly once."""
    import threading

    path = str(tmp_path / "race")
    VersionedStageTable(spark, path).overwrite(_df(spark, [(0, "seed")]))
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        ConcurrentCommitError,
    )

    losses = []

    def writer(tag: str, keys: list) -> None:
        t = VersionedStageTable(spark, path)
        for k in keys:
            batch = _df(spark, [(k, tag)])
            while True:
                try:
                    t.append(batch)
                    break
                except ConcurrentCommitError:
                    losses.append((tag, k))
    t1 = threading.Thread(target=writer, args=("w1", [1, 2, 3]))
    t2 = threading.Thread(target=writer, args=("w2", [11, 12, 13]))
    t1.start(); t2.start(); t1.join(); t2.join()
    t = VersionedStageTable(spark, path)
    # one seed + six appends, each a distinct committed version
    assert t.versions() == list(range(7))
    got = _rows(t.read())
    assert got == [(0, "seed"), (1, "w1"), (2, "w1"), (3, "w1"),
                   (11, "w2"), (12, "w2"), (13, "w2")]
    ops = [h["op"] for h in t.history()]
    assert ops == ["overwrite"] + ["append"] * 6


def test_delete_is_cow_and_keeps_null_condition_rows(spark, table):
    """COW DELETE: files without a matching row carry over by name; the
    rewritten files lose exactly the TRUE-condition rows (NULL keeps,
    SQL DELETE semantics); old versions stay readable."""
    table.overwrite(
        spark.createDataFrame(
            [(1, 10), (2, None), (3, 30), (4, 40)], "k int, v int"
        )
    )
    f0 = set(table._manifest(0)["files"])
    v1 = table.delete("v > 25")
    assert v1 == 1
    assert _rows(table.read()) == [(1, 10), (2, None)]
    assert _rows(table.read(0)) == [(1, 10), (2, None), (3, 30), (4, 40)]
    ops = [h["op"] for h in table.history()]
    assert ops == ["overwrite", "delete"]
    # change feed shows only deletes
    ch = table.changes(0, 1)
    assert {r["_change_type"] for r in ch.collect()} == {"delete"}
    assert sorted(r["k"] for r in ch.collect()) == [3, 4]
    # untouched files carried by name (single-file v0 may rewrite all;
    # only assert carry when some v0 file held no matching row)
    untouched = {
        f for f in f0
        if spark.read.parquet(table._abs(f)).filter("v > 25").count() == 0
    }
    assert untouched <= set(table._manifest(1)["files"])


def test_delete_no_match_is_noop(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    assert table.delete("k = 999") == 0
    assert table.versions() == [0]


def test_tags_read_and_survive_vacuum(spark, table):
    """Iceberg-style named refs: read(tag=) resolves; a tagged version
    survives vacuum past the retention count; untag then vacuum drops it."""
    table.overwrite(_df(spark, [(1, "a")]))
    table.overwrite(_df(spark, [(2, "b")]))
    table.overwrite(_df(spark, [(3, "c")]))
    table.tag("baseline", 0)
    assert table.tags() == {"baseline": 0}
    assert _rows(table.read(tag="baseline")) == [(1, "a")]
    out = table.vacuum(retain_last=1, data_grace_seconds=0.0)
    assert out["versions_dropped"] == [1]  # 0 is tagged, 2 retained
    assert _rows(table.read(tag="baseline")) == [(1, "a")]
    with pytest.raises(VersionNotFoundError):
        table.read(1)
    table.untag("baseline")
    out2 = table.vacuum(retain_last=1, data_grace_seconds=0.0)
    assert out2["versions_dropped"] == [0]
    with pytest.raises(VersionNotFoundError):
        table.read(tag="baseline")
    with pytest.raises(ValueError):
        table.tag("bad name!")


def test_check_constraints_enforced_on_commits(spark, table):
    """ADD CONSTRAINT validates existing data, then every subsequent
    batch: FALSE rows refuse the commit (table unchanged), NULL rows
    pass (SQL CHECK semantics), and the constraint carries forward
    through later commits."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        ConstraintViolationError,
    )

    table.overwrite(
        spark.createDataFrame([(1, 10), (2, None)], "k int, v int")
    )
    v = table.add_constraint("v_positive", "v > 0")
    assert v == 1 and table.constraints() == {"v_positive": "v > 0"}
    # violating batch refused on append AND merge, table unchanged
    bad = spark.createDataFrame([(3, -5)], "k int, v int")
    with pytest.raises(ConstraintViolationError, match="v_positive"):
        table.append(bad)
    with pytest.raises(ConstraintViolationError, match="v_positive"):
        table.merge(bad, ["k"])
    assert table.latest_version() == 1
    # NULL passes; good rows pass; constraint survives the commit
    table.append(spark.createDataFrame([(4, None), (5, 50)], "k int, v int"))
    assert table.constraints() == {"v_positive": "v > 0"}
    # adding a constraint the EXISTING table violates is refused
    with pytest.raises(ConstraintViolationError):
        table.add_constraint("k_small", "k < 3")
    table.drop_constraint("v_positive")
    assert table.constraints() == {}
    table.append(bad)  # now allowed
    assert (3, -5) in _rows(table.read())


def test_two_writer_barrier_race_exactly_one_loser(spark, table):
    """DETERMINISTIC contention on the os.link commit point — no
    monkeypatching: a barrier lines two real writer threads up so both
    pin version 1 off the same log snapshot and hit _commit together.
    Exactly one wins version 1; the other observes
    ConcurrentCommitError, re-reads the log, and lands version 2 with
    BOTH batches' content intact."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        ConcurrentCommitError,
    )

    table.overwrite(_df(spark, [(0, "base")]))
    barrier = threading.Barrier(2)
    outcomes = {}

    def writer(tag, batch):
        # read-compute: pin against the CURRENT log, write data files,
        # then meet at the barrier so both commits target version 1
        prev = table._manifest(table.latest_version())
        files = table._write_files(batch, prev["version"] + 1)
        barrier.wait(timeout=60)
        try:
            v = table._commit(
                "append", add=files, schema_json=prev["schema"],
                version=prev["version"] + 1,
            )
            outcomes[tag] = ("won", v)
        except ConcurrentCommitError:
            cur = table._manifest(table.latest_version())
            v = table._commit(
                "append", add=files, schema_json=cur["schema"],
                version=cur["version"] + 1,
            )
            outcomes[tag] = ("retried", v)

    with ThreadPoolExecutor(2) as pool:
        futs = [
            pool.submit(writer, "w1", _df(spark, [(1, "a")])),
            pool.submit(writer, "w2", _df(spark, [(2, "b")])),
        ]
        for f in futs:
            f.result(timeout=300)

    assert sorted(o for o, _ in outcomes.values()) == ["retried", "won"]
    assert {v for _, v in outcomes.values()} == {1, 2}
    assert _rows(table.read()) == [(0, "base"), (1, "a"), (2, "b")]
    assert [h["op"] for h in table.history()] == [
        "overwrite", "append", "append",
    ]


def test_delete_on_schema_evolved_table_keeps_evolved_values(spark, table):
    """DELETE reads through the MANIFEST schema: on a schema-evolved
    table the rewrite must backfill NULL for pre-evolution files and —
    critically — must NOT drop evolved-column values from
    post-evolution files when Spark would have inferred the schema from
    a pre-evolution footer."""
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    table.append(
        spark.createDataFrame(
            [(3, "c", 30), (4, "d", 40)], "k int, v string, extra int"
        ),
        merge_schema=True,
    )
    v = table.delete("k = 3")
    assert v == 2
    got = _rows(table.read())
    # evolved column survives the rewrite; pre-evolution rows read NULL
    assert got == [(1, "a", None), (2, "b", None), (4, "d", 40)]


def test_merge_on_schema_evolved_table_backfills_null(spark, table):
    """MERGE reads the current snapshot through the manifest schema, so
    an upsert against a table evolved via append(merge_schema=True)
    works: pre-evolution files backfill NULL instead of failing on a
    footer-inferred schema."""
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    table.append(
        spark.createDataFrame([(3, "c", 30)], "k int, v string, extra int"),
        merge_schema=True,
    )
    table.merge(
        spark.createDataFrame(
            [(2, "B", 20), (5, "e", 50)], "k int, v string, extra int"
        ),
        ["k"],
    )
    assert _rows(table.read()) == [
        (1, "a", None), (2, "B", 20), (3, "c", 30), (5, "e", 50),
    ]


def test_restore_validates_current_constraints(spark, table):
    """RESTORE is a commit like any other: restoring a snapshot that
    violates an ACTIVE CHECK constraint raises and leaves the table
    unchanged (otherwise the table would hold a constraint its own
    content violates); restoring a conforming snapshot still works."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        ConstraintViolationError,
    )

    table.overwrite(
        spark.createDataFrame([(1, -10)], "k int, v int")
    )  # v0: pre-constraint, violating data
    table.overwrite(
        spark.createDataFrame([(2, 20)], "k int, v int")
    )  # v1: conforming
    table.add_constraint("v_positive", "v > 0")  # v2
    with pytest.raises(ConstraintViolationError, match="v_positive"):
        table.restore(0)
    assert table.latest_version() == 2  # refused commit left no version
    v = table.restore(1)
    assert v == 3
    assert _rows(table.read()) == [(2, 20)]
    assert table.constraints() == {"v_positive": "v > 0"}


def test_asof_rt_reserved_even_without_tolerance(spark):
    """'__rt' rides the payload struct unconditionally, so the
    reservation must hold with tolerance=None too (a payload column of
    that name would silently resolve to the match time)."""
    from cdk_datalake_ingest_upeu_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:00:05")], "id string, t string"
    ).withColumn("t", F.to_timestamp("t"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:01", 1)], "id string, rt string, __rt int"
    ).withColumn("rt", F.to_timestamp("rt"))
    with pytest.raises(ValueError, match="__rt.*reserved"):
        asof_join(left, right, on="id", left_time="t", right_time="rt")


def test_merge_resolve_by_latest_wins_and_tie_raises(spark, table):
    """resolve_by: per key the row sorting LAST by the listed columns
    wins (latest-wins, NULLS LAST); rows still tied on key + resolve
    columns with differing payloads raise — determinism is never
    delegated to execution order. Without resolve_by the multi-row
    source still raises (Delta's multiple-match error)."""
    t = table
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", 0), (2, "b", 0)], "k int, v string, seq int"
        )
    )
    src = spark.createDataFrame(
        [(2, "old", 1), (2, "new", 2), (3, "c", 1)],
        "k int, v string, seq int",
    )
    with pytest.raises(ValueError, match="multiple distinct rows"):
        t.merge(src, ["k"])
    t.merge(src, ["k"], resolve_by=["seq"])
    assert _rows(t.read()) == [(1, "a", 0), (2, "new", 2), (3, "c", 1)]
    # ambiguous: same key, same resolve value, different payload
    bad = spark.createDataFrame(
        [(5, "x", 9), (5, "y", 9)], "k int, v string, seq int"
    )
    with pytest.raises(ValueError, match="tied on key \\+ resolve"):
        t.merge(bad, ["k"], resolve_by=["seq"])
    assert t.latest_version() == 1  # refused merge committed nothing
    with pytest.raises(ValueError, match="resolve_by columns"):
        t.merge(src, ["k"], resolve_by=["nope"])


def test_prune_candidate_files_soundness():
    """Pure pruner semantics: recognized conjuncts skip only provably
    non-matching files; anything outside the fragment keeps everything."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        prune_candidate_files,
    )

    stats = {
        "a": {"k": [1, 10], "s": ["a", "m"]},
        "b": {"k": [11, 20], "s": ["n", "z"]},
        "c": {},                    # zero-row / no info
    }
    files = ["a", "b", "c", "d"]    # d has no stats entry at all
    pr = prune_candidate_files
    # without stat_cols knowledge, a missing column NEVER excludes
    # (it might be an unsupported type, not schema evolution)
    assert pr(files, stats, "k = 15") == ["b", "c", "d"]
    assert pr(files, stats, "k < 5") == ["a", "c", "d"]
    assert pr(files, stats, "k >= 11") == ["b", "c", "d"]
    assert pr(files, stats, "15 <= k") == ["b", "c", "d"]   # flipped
    assert pr(files, stats, "(k > 3) AND (k < 8)") == ["a", "c", "d"]
    assert pr(files, stats, "s = 'q'") == ["b", "c", "d"]
    # contradiction across conjuncts: both ranged files drop
    assert pr(files, stats, "k > 25") == ["c", "d"]
    # with stat_cols, absence proves all-NULL / zero rows: 'c' drops too
    assert pr(files, stats, "k = 15", stat_cols={"k", "s"}) == ["b", "d"]
    # unsupported shapes never prune
    assert pr(files, stats, "k = 15 OR k = 2") == files
    assert pr(files, stats, "k BETWEEN 2 AND 3") == files
    assert pr(files, stats, "k % 7 = 3") == files
    assert pr(files, stats, "upper(s) = 'Q'") == files
    # schema evolution: column absent from the pre-evolution file's
    # bounds excludes it only under stat_cols
    stats2 = {"old": {"k": [1, 5]}, "new": {"k": [6, 9], "v": [0, 1]}}
    assert pr(["old", "new"], stats2, "v = 1") == ["old", "new"]
    assert pr(["old", "new"], stats2, "v = 1",
              stat_cols={"k", "v"}) == ["new"]
    # a column of UNSUPPORTED type (not in stat_cols) never excludes
    assert pr(["old", "new"], stats2, "dec_col = 1",
              stat_cols={"k", "v"}) == ["old", "new"]
    # unknown bound (NaN) never excludes
    stats3 = {"x": {"d": [0.5, None]}}
    assert pr(["x"], stats3, "d > 99") == ["x"]
    assert pr(["x"], stats3, "d < 0.1") == []


def test_delete_and_merge_record_pruning_metrics(spark, table):
    """Stats land in the manifest at commit time; DELETE and MERGE
    prune candidates from them and record files_total/candidate/
    rewritten metrics (Delta operationMetrics analog). Three one-file
    commits with disjoint key ranges; a predicate inside one range must
    scan exactly one candidate."""
    for lo in (0, 100, 200):
        rows = [(lo + i, f"v{lo + i}") for i in range(5)]
        if lo == 0:
            table.overwrite(_df(spark, rows).coalesce(1))
        else:
            table.append(_df(spark, rows).coalesce(1))
    m = table._manifest(2)
    assert len(m["files"]) == 3 and set(m["stats"]) == set(m["files"])
    ks = sorted(tuple(s["k"]) for s in m["stats"].values())
    assert ks == [(0, 4), (100, 104), (200, 204)]
    v = table.delete("k >= 100 AND k <= 101")
    met = table._manifest(v)["metrics"]
    assert met == {
        "files_total": 3, "files_candidate": 1, "files_rewritten": 1,
    }
    assert _rows(table.read()) == [
        (k, f"v{k}") for k in [0, 1, 2, 3, 4, 102, 103, 104,
                               200, 201, 202, 203, 204]
    ]
    # merge whose source keys fall inside ONE file's range: one candidate
    table.merge(_df(spark, [(201, "X"), (250, "new")]), ["k"])
    met2 = table._manifest(table.latest_version())["metrics"]
    assert met2["files_total"] == 3  # post-delete snapshot: still 3 files
    assert met2["files_candidate"] == 1 and met2["files_rewritten"] == 1
    got = dict(_rows(table.read()))
    assert got[201] == "X" and got[250] == "new" and got[202] == "v202"
    # a predicate excluded by EVERY file's stats is a zero-IO no-op
    v_before = table.latest_version()
    assert table.delete("k > 9999") == v_before
    # history surfaces the metrics
    hist = {h["version"]: h.get("metrics") for h in table.history()}
    assert hist[v] == met


def test_compact_zorder_clusters_and_sharpens_stats(spark, table):
    """OPTIMIZE ZORDER analog: content identical after the rewrite, op
    recorded as 'zorder', and the per-file key bounds become disjoint
    enough that a range DELETE prunes to fewer candidates than the
    scattered layout needed."""
    import random

    rows = [(i, f"v{i}") for i in range(300)]
    random.Random(7).shuffle(rows)
    table.overwrite(_df(spark, rows).repartition(3))
    before = _rows(table.read())
    v = table.compact(zorder_by=["k"], target_files=3)
    assert table._manifest(v)["op"] == "zorder"
    assert _rows(table.read()) == before
    m = table._manifest(v)
    assert len(m["files"]) == 3
    spans = sorted(tuple(s["k"]) for s in m["stats"].values())
    # clustered: ranges are non-overlapping (each file a key interval)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo
    dv = table.delete("k >= 120 AND k < 160")
    met = table._manifest(dv)["metrics"]
    assert met["files_total"] == 3 and met["files_candidate"] <= 2
    assert sorted(r[0] for r in table.read().collect()) == [
        i for i in range(300) if not (120 <= i < 160)
    ]
    with pytest.raises(ValueError, match="zorder_by columns"):
        table.compact(zorder_by=["nope"])


def test_string_stats_truncated_soundly(spark, table):
    """Long string bounds never land in the manifest verbatim: the min
    truncates to a 64-char prefix (still a valid lower bound), the max
    degrades to None (a truncated prefix would be a FAKE upper bound);
    pruning against the truncated bounds stays conservative."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        prune_candidate_files,
    )

    long_a = "a" * 500
    long_z = "z" * 500
    table.overwrite(
        spark.createDataFrame(
            [(1, long_a), (2, long_z)], "k int, v string"
        ).coalesce(1)
    )
    st = next(iter(table._manifest(0)["stats"].values()))
    lo, hi = st["v"]
    assert lo == "a" * 64 and hi is None
    assert len(json.dumps(table._manifest(0))) < 4096
    # lower bound still prunes; upper bound (unknown) never does
    files = list(table._manifest(0)["files"])
    stats = table._manifest(0)["stats"]
    assert prune_candidate_files(files, stats, "v < 'a'") == []
    assert prune_candidate_files(files, stats, "v > 'zzz'") == files


def test_lookup_scans_only_pruned_candidates(spark, table):
    """lookup(): result equals read().filter(), but only stats-surviving
    files enter the plan (checked via inputFiles); unsupported
    predicates fall back to the full scan with identical results."""
    for lo in (0, 100, 200):
        rows = [(lo + i, f"v{lo + i}") for i in range(5)]
        (table.overwrite if lo == 0 else table.append)(
            _df(spark, rows).coalesce(1)
        )
    out = table.lookup("k >= 100 AND k <= 102")
    assert _rows(out) == [(100, "v100"), (101, "v101"), (102, "v102")]
    m = table._manifest(table.latest_version())
    scanned = {table._rel_path(f) for f in out.inputFiles()}
    assert len(scanned) == 1 and scanned <= set(m["files"])
    # proven-empty range: zero files scanned, schema intact
    empty = table.lookup("k > 9999")
    assert empty.count() == 0 and empty.columns == ["k", "v"]
    # unsupported fragment: full scan, same rows as read().filter()
    got = _rows(table.lookup("k % 100 = 3"))
    assert got == [(3, "v3"), (103, "v103"), (203, "v203")]
    # time travel + tags compose
    table.tag("base", 0)
    assert _rows(table.lookup("k <= 1", tag="base")) == [(0, "v0"), (1, "v1")]
    with pytest.raises(VersionNotFoundError):
        table.lookup("k = 1", tag="nope")


# ===========================================================================
# round-10: delta-encoded log, checkpoints, LogStore seam, footer stats
# ===========================================================================


def test_commit_record_is_o_changed_files(spark, table):
    """The 100 TB log-growth fix: a commit's on-disk record lists only
    the files it ADDS and REMOVES — an append of one file to a
    many-file table writes a one-file record, never the table's file
    list (Delta's add/remove-action encoding)."""
    table.overwrite(_df(spark, [(0, "seed")]).coalesce(1))
    # grow the table to many files without crossing a checkpoint
    t = VersionedStageTable(spark, table.path, checkpoint_interval=1000)
    for k in range(1, 8):
        t.append(_df(spark, [(k, f"v{k}")]).coalesce(1))
    assert len(t._manifest(t.latest_version())["files"]) == 8
    rec = t._commit_record(t.latest_version())
    assert "files" not in rec
    assert len(rec["add"]) == 1 and rec["remove"] == []
    assert set(rec["stats"]) == set(rec["add"])
    # the record stays O(1)-file-sized no matter the table
    import os as _os

    sizes = [
        _os.path.getsize(_os.path.join(t.log_dir, f"{v:08d}.json"))
        for v in t.versions()[1:]
    ]
    assert max(sizes) - min(sizes) < 200  # no per-version growth


def test_checkpoint_written_and_anchors_resolution(spark, tmp_path):
    """Every checkpoint_interval commits a full-snapshot checkpoint
    lands; snapshot resolution anchors there (reads at most interval
    records) and reproduces exactly the state the incremental log
    implies — including accumulated per-file stats."""
    t = VersionedStageTable(
        spark, str(tmp_path / "cp"), checkpoint_interval=4
    )
    for k in range(10):
        t.append(_df(spark, [(k, f"v{k}")]).coalesce(1))
    assert t.checkpoints() == [4, 8]
    m = t._manifest(9)
    assert len(m["files"]) == 10
    assert _rows(t.read(9)) == [(k, f"v{k}") for k in range(10)]
    # stats accumulated across the checkpoint boundary: every file has
    # bounds, including ones committed before version 8's checkpoint
    assert set(m["stats"]) == set(m["files"])
    assert sorted(s["k"] for s in m["stats"].values()) == [
        [k, k] for k in range(10)
    ]
    # time travel to a pre-checkpoint version still resolves
    assert _rows(t.read(2)) == [(0, "v0"), (1, "v1"), (2, "v2")]


def test_vacuum_keeps_every_retained_version_resolvable(spark, tmp_path):
    """Vacuum drops old delta records; retained versions (including a
    TAGGED one far in the past) must still resolve — vacuum writes the
    checkpoints that replace the dropped resolution chains."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vk"), checkpoint_interval=100
    )
    for k in range(12):
        t.append(_df(spark, [(k, f"v{k}")]).coalesce(1))
    t.tag("old", 3)
    got = t.vacuum(retain_last=2, data_grace_seconds=0.0)
    assert got["versions_dropped"] == [v for v in range(12) if v not in
                                       (3, 10, 11)]
    # all three survivors resolve with full content
    assert _rows(t.read(tag="old")) == [(k, f"v{k}") for k in range(4)]
    assert _rows(t.read(10)) == [(k, f"v{k}") for k in range(11)]
    assert _rows(t.read(11)) == [(k, f"v{k}") for k in range(12)]
    # and their stats survived the re-anchoring
    assert set(t._manifest(11)["stats"]) == set(t._manifest(11)["files"])
    # dropped versions raise, exactly as before
    with pytest.raises(VersionNotFoundError):
        t.read(5)
    # the table keeps working after the re-anchor
    t.append(_df(spark, [(99, "post")]).coalesce(1))
    assert (99, "post") in set(_rows(t.read()))


def test_log_store_seam_carries_the_commit(spark, tmp_path):
    """The commit point is the LogStore, not os.link inline: a counting
    store sees exactly one put_if_absent per clean commit — the
    documented S3 conditional-PUT mapping drops into this seam. A
    reported loss with NO real winner in the log (a transient store
    refusal) is retried at the same version by the commit-rebase
    protocol and wins; real-winner races are covered in
    test_concurrency.py."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        PosixLinkLogStore,
    )

    class CountingStore(PosixLinkLogStore):
        def __init__(self):
            self.puts = []
            self.lose_next = False

        def put_if_absent(self, target, content):
            self.puts.append(target)
            if self.lose_next:
                self.lose_next = False
                return False
            return super().put_if_absent(target, content)

    store = CountingStore()
    t = VersionedStageTable(
        spark, str(tmp_path / "seam"), log_store=store
    )
    t.overwrite(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    assert [os.path.basename(p) for p in store.puts] == [
        "00000000.json", "00000001.json",
    ]
    store.lose_next = True
    v = t.append(_df(spark, [(3, "c")]))
    assert v == 2
    assert [os.path.basename(p) for p in store.puts][-2:] == [
        "00000002.json", "00000002.json",
    ]
    assert _rows(t.read()) == [(1, "a"), (2, "b"), (3, "c")]


def test_enforce_probes_all_constraints_in_one_job(spark, table):
    """k CHECK constraints cost ONE Spark job per commit, not k: the
    violation flags are computed in a single projection with an
    early-exit limit(1), and the violated constraint is still named
    exactly."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        ConstraintViolationError,
    )

    table.overwrite(_df(spark, [(1, "a")]))
    table.add_constraint("k_pos", "k > 0")
    table.add_constraint("v_nonempty", "length(v) > 0")
    table.add_constraint("k_small", "k < 1000")
    # CollectLimitExec may run a couple of scale-up jobs for ONE
    # limit(1); the pin is that job count does NOT scale with k —
    # probing 3 constraints costs exactly what probing 1 costs
    sc = spark.sparkContext
    batch = _df(spark, [(5, "ok"), (6, "fine")])

    def _jobs(group: str, constraints: dict) -> int:
        sc.setJobGroup(group, "count jobs in _enforce")
        table._enforce(batch, constraints)
        sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    n1 = _jobs("enforce-one", {"k_pos": "k > 0"})
    n3 = _jobs("enforce-three", table.constraints())
    assert len(table.constraints()) == 3
    assert n3 == n1, f"3 constraints cost {n3} jobs vs {n1} for 1"
    # violation still names the right constraint
    with pytest.raises(ConstraintViolationError, match="v_nonempty"):
        table.append(_df(spark, [(7, "")]))
    with pytest.raises(ConstraintViolationError, match="k_small"):
        table.append(_df(spark, [(7777, "x")]))


def test_footer_stats_match_spark_scan_for_nan_free_types(spark, table):
    """Footer-collected bounds (no Spark job) must equal what the old
    Spark scan computed — including NULL handling, the 64-char string
    truncation discipline, zero-row files, and (r14) doubles: a NaN in
    the data degrades the upper bound to None exactly as
    ``_stat_value(NaN)`` did on the scan path."""
    df = spark.createDataFrame(
        [
            (1, "apple", 1.5),
            (2, None, float("nan")),
            (3, "z" * 500, -2.0),
            (None, "mid", 0.0),
        ],
        "k int, s string, d double",
    ).coalesce(1)
    table.overwrite(df)
    st = next(iter(table._manifest(0)["stats"].values()))
    assert st["k"] == [1, 3]            # footer path, NULL excluded
    assert st["s"][0] == "apple"        # min intact
    assert st["s"][1] is None           # >64-char max degrades to None
    assert st["d"] == [-2.0, None]      # NaN-greatest → unknown upper
    # all-NULL column: bounds unknown, never prunes
    df2 = spark.createDataFrame(
        [(None, None)], "k int, s string"
    ).coalesce(1)
    t2 = VersionedStageTable(spark, table.path + "_nulls")
    t2.overwrite(df2)
    st2 = next(iter(t2._manifest(0)["stats"].values()))
    assert st2["k"] == [None, None] and st2["s"] == [None, None]


def test_footer_stats_float_nan_poisons_upper_bound(spark, table):
    """Pins the two properties the r14 footer-path float stats rest on:

    (a) the BUNDLED Spark parquet writer emits NaN-GREATEST chunk
        stats — a chunk containing NaN carries max=NaN in its footer
        (if a Spark upgrade ever reverts to NaN-ignoring stats this
        assertion fails and float stats must go back to the scan);
    (b) ``_footer_stats`` turns that marker into a sticky None upper
        bound across row groups in EITHER order — a clean later chunk
        must not resurrect a bound a NaN chunk invalidated — while the
        lower bound stays exact, and an all-NaN file degrades to
        [None, None] like the Spark scan's min=max=NaN did.
    """
    import math as _math

    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    # one row group with NaN, written by Spark itself
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (-4.0,)], "d double"
    ).coalesce(1)
    table.overwrite(df)
    rel = table._manifest(0)["files"][0]
    st = pq.ParquetFile(table._abs(rel)).metadata.row_group(0).column(0).statistics
    assert st.has_min_max and _math.isnan(st.max), (
        "Spark's parquet writer no longer emits NaN-greatest float "
        "stats — footer-path float bounds are UNSOUND; revert "
        "_collect_stats to the Spark scan for float/double"
    )
    assert table._manifest(0)["stats"][rel]["d"] == [-4.0, None]

    # direct _footer_stats probe over the same file: upper bound must
    # stay None (the nan_hi sticky set), lower bound must stay exact
    out = {rel: {}}
    ok = table._footer_stats(out, [rel], ["d"], {"d": T.DoubleType()})
    assert ok and out[rel]["d"] == [-4.0, None]

    # FLOAT (32-bit) takes the same footer path — pin the writer's
    # NaN-greatest behavior for it too (review r14: double alone left
    # float stats unpinned)
    tf = VersionedStageTable(spark, table.path + "_f32")
    tf.overwrite(
        spark.createDataFrame(
            [(1.25,), (float("nan"),), (-3.5,)], "f float"
        ).coalesce(1)
    )
    relf = tf._manifest(0)["files"][0]
    stf = (
        pq.ParquetFile(tf._abs(relf)).metadata.row_group(0).column(0).statistics
    )
    assert stf.has_min_max and _math.isnan(stf.max), (
        "Spark's parquet writer no longer emits NaN-greatest FLOAT "
        "stats — revert _collect_stats to the Spark scan for floats"
    )
    assert tf._manifest(0)["stats"][relf]["f"] == [-3.5, None]
    # all-NaN file: no finite values — both bounds unknown
    t2 = VersionedStageTable(spark, table.path + "_allnan")
    t2.overwrite(
        spark.createDataFrame(
            [(float("nan"),), (float("nan"),)], "d double"
        ).coalesce(1)
    )
    rel2 = t2._manifest(0)["files"][0]
    assert t2._manifest(0)["stats"][rel2]["d"] == [None, None]

    # chunk-order stickiness: NaN chunk first, clean chunks after — the
    # clean chunks must not resurrect the upper bound. Tiny block size
    # forces multiple row groups from one Spark write.
    t3 = VersionedStageTable(spark, table.path + "_rgorder")
    rows = [(float("nan"),)] * 150 + [(float(i),) for i in range(10000)]
    df3 = spark.createDataFrame(rows, "d double").coalesce(1)
    # route through the table's own writer but with a small row-group
    # target so the NaN rows land in their own leading chunk
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(16 * 1024))
    try:
        t3.overwrite(df3)
    finally:
        if old is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old)
    rel3 = t3._manifest(0)["files"][0]
    md3 = pq.ParquetFile(t3._abs(rel3)).metadata
    if md3.num_row_groups >= 2:  # writer split as intended
        assert t3._manifest(0)["stats"][rel3]["d"] == [0.0, None]


def test_split_top_and_respects_spark_string_escapes():
    """ADVICE r9 (medium): a backslash-escaped or doubled quote inside
    a string literal must not close the quote — the splitter would
    otherwise fabricate conjuncts Spark's parser never sees, and
    pruning would silently exclude files containing matching rows."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        _split_top_and,
        prune_candidate_files,
    )

    # ONE literal to Spark: "x' AND c2 = 5 AND tail = 'y"
    cond = r"c1 = 'x\' AND c2 = 5 AND tail = \'y'"
    assert _split_top_and(cond) == [cond]
    # doubled-quote escape, same story
    cond2 = "c1 = 'x'' AND c2 = 5 AND tail = ''y'"
    assert _split_top_and(cond2) == [cond2]
    # unterminated literal: no split is trustworthy → no pruning
    assert _split_top_and("c1 = 'dangling") is None
    # end-to-end: a file whose c2 bounds exclude 5 must NOT be pruned,
    # because 'c2 = 5' is inside a string literal, not a conjunct
    stats = {"f": {"c2": [100, 200]}}
    got = prune_candidate_files(["f"], stats, cond, stat_cols={"c2"})
    assert got == ["f"]
    # plain conjuncts still split and prune as before
    assert _split_top_and("a = 1 AND b = 'two'") == ["a = 1", "b = 'two'"]
    assert prune_candidate_files(
        ["f"], stats, "c2 = 5", stat_cols={"c2"}
    ) == []


def test_rel_path_url_decodes_input_file_name(spark, tmp_path):
    """ADVICE r9 (low): input_file_name() returns URL-encoded URIs; a
    table path with a space must still map stats groups back to the
    committed files (a silent miss would leave unsound empty stats)."""
    t = VersionedStageTable(spark, str(tmp_path / "with space"))
    t.overwrite(_df(spark, [(1, "a"), (2, "b")]).coalesce(1))
    st = t._manifest(0)["stats"]
    assert set(st) == set(t._manifest(0)["files"])
    assert next(iter(st.values()))["k"] == [1, 2]
    # delete's touched-file bookkeeping also goes through _rel_path
    t.delete("k = 1")
    assert _rows(t.read()) == [(2, "b")]


# ===========================================================================
# round-10: deletion vectors (merge-on-read DELETE)
# ===========================================================================


def test_dv_delete_rewrites_nothing_and_reads_right(spark, table):
    """delete(mode='dv'): zero data files rewritten (names AND bytes
    identical), the commit is a sidecar + log record, and every read
    path applies the mask — read(), lookup(), time travel back across
    the DV commit."""
    for lo in (0, 100, 200):
        rows = [(lo + i, f"v{lo + i}") for i in range(5)]
        (table.overwrite if lo == 0 else table.append)(
            _df(spark, rows).coalesce(1)
        )
    files_before = table._manifest(2)["files"]
    sizes_before = {f: os.path.getsize(table._abs(f)) for f in files_before}
    v = table.delete("k >= 100 AND k <= 101", mode="dv")
    m = table._manifest(v)
    assert m["files"] == files_before  # no file added or removed
    assert {
        f: os.path.getsize(table._abs(f)) for f in files_before
    } == sizes_before  # no byte rewritten
    met = m["metrics"]
    assert met["files_rewritten"] == 0 and met["dv_rows"] == 2
    assert met["files_candidate"] == 1 and met["dv_files"] == 1
    assert _rows(table.read()) == [
        (k, f"v{k}") for k in [0, 1, 2, 3, 4, 102, 103, 104,
                               200, 201, 202, 203, 204]
    ]
    # lookup composes stats pruning with the mask
    assert _rows(table.lookup("k >= 100 AND k <= 102")) == [(102, "v102")]
    # time travel: the pre-delete snapshot still shows the rows
    assert (100, "v100") in set(_rows(table.read(2)))
    # a second DV delete on the SAME file unions masks (and never
    # re-lists already-masked rows)
    v2 = table.delete("k = 103", mode="dv")
    assert table._manifest(v2)["metrics"]["dv_rows"] == 1
    assert _rows(table.lookup("k >= 100 AND k <= 104")) == [
        (102, "v102"), (104, "v104"),
    ]


def test_dv_interacts_with_merge_cow_delete_and_compact(spark, table):
    """Masked rows are dead for every operator: MERGE can't match them
    (an upsert of a masked key INSERTS), a later COW delete doesn't
    resurrect neighbors, and compact() purges the mask — same rows,
    clean files, dv gone from the manifest."""
    table.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1))
    table.delete("k = 2", mode="dv")
    assert _rows(table.read()) == [(1, "a"), (3, "c")]
    # merge on the masked key: no match -> pure insert, and the
    # rewritten file purges its mask (file removed => dv dropped)
    table.merge(_df(spark, [(2, "B2")]), ["k"])
    assert _rows(table.read()) == [(1, "a"), (2, "B2"), (3, "c")]
    # fresh dv + COW delete of a different key: masked row stays dead
    table.delete("k = 3", mode="dv")
    table.delete("k = 1")  # cow
    assert _rows(table.read()) == [(2, "B2")]
    # compact purges any remaining mask
    v = table.compact()
    m = table._manifest(v)
    assert "dv" not in m
    assert _rows(table.read()) == [(2, "B2")]
    assert m["metrics"]["dv_purged"] >= 0


def test_dv_change_feed_and_restore(spark, table):
    """The change feed sees a DV delete as row-level deletes even
    though the file set is identical; restore back across a DV commit
    resurrects the rows exactly (mask reset, not unioned)."""
    table.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1))
    v1 = table.delete("k = 2", mode="dv")
    got = sorted(
        (r["_change_type"], r["k"]) for r in table.changes(0, v1).collect()
    )
    assert got == [("delete", 2)]
    # restore to v0: the mask must SHRINK back to empty
    v2 = table.restore(0)
    assert _rows(table.read()) == [(1, "a"), (2, "b"), (3, "c")]
    assert "dv" not in table._manifest(v2)
    # the feed across the restore shows the resurrection as an insert
    got2 = sorted(
        (r["_change_type"], r["k"]) for r in table.changes(v1, v2).collect()
    )
    assert got2 == [("insert", 2)]
    # and v1 time-travels with the mask applied
    assert _rows(table.read(v1)) == [(1, "a"), (3, "c")]


def test_dv_vacuum_protects_sidecars(spark, table):
    """VACUUM must keep the sidecars of retained versions (deleting one
    would resurrect masked rows) and reclaim them once no retained
    version references the mask."""
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]).coalesce(1))
    v1 = table.delete("k = 1", mode="dv")
    sidecars = [
        s for lst in table._manifest(v1)["dv"].values() for s in lst
    ]
    assert sidecars and all(
        os.path.exists(table._abs(s)) for s in sidecars
    )
    table.vacuum(retain_last=1, data_grace_seconds=0.0)
    # the DV version is the latest: its mask survives and still applies
    assert all(os.path.exists(table._abs(s)) for s in sidecars)
    assert _rows(table.read()) == [(2, "b")]
    # rewrite everything, then vacuum: the mask is unreferenced -> gone
    table.compact()
    table.vacuum(retain_last=1, data_grace_seconds=0.0)
    assert not any(os.path.exists(table._abs(s)) for s in sidecars)
    assert _rows(table.read()) == [(2, "b")]


def test_dv_checkpoint_carries_masks(spark, tmp_path):
    """Snapshot resolution through a checkpoint keeps deletion vectors:
    a read anchored at the checkpoint must still apply masks committed
    BEFORE it."""
    t = VersionedStageTable(
        spark, str(tmp_path / "dvcp"), checkpoint_interval=3
    )
    t.overwrite(_df(spark, [(k, f"v{k}") for k in range(6)]).coalesce(1))
    t.delete("k = 1", mode="dv")
    t.append(_df(spark, [(10, "x")]).coalesce(1))
    t.append(_df(spark, [(11, "y")]).coalesce(1))  # v3 -> checkpoint
    assert 3 in t.checkpoints()
    t.append(_df(spark, [(12, "z")]).coalesce(1))
    # resolution of v4 anchors at checkpoint 3; mask from v1 must hold
    assert (1, "v1") not in set(_rows(t.read()))
    assert t._manifest(4).get("dv")


def test_dv_free_read_plan_has_no_join(spark, table):
    """The DV machinery must cost NOTHING on tables without masks: a
    read of a DV-less table is a plain parquet scan (no join, no
    metadata columns), and after compact() purges a mask the plan is
    clean again."""
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]).coalesce(1))
    plan = table.read()._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "_metadata" not in plan
    table.delete("k = 1", mode="dv")
    plan_dv = table.read()._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan_dv  # the mask arm pays exactly one anti-join
    table.compact()
    plan2 = table.read()._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan2 and "_metadata" not in plan2


def test_dv_delete_on_schema_evolved_table(spark, table):
    """DV delete reads through the MANIFEST schema: on an evolved table
    the mask lands correctly for both pre- and post-evolution files,
    evolved values survive (no rewrite at all), and pre-evolution rows
    read NULL for the new column as ever."""
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]).coalesce(1))
    table.append(
        spark.createDataFrame(
            [(3, "c", 30), (4, "d", 40)], "k int, v string, extra int"
        ).coalesce(1),
        merge_schema=True,
    )
    v = table.delete("k = 3 OR k = 1", mode="dv")
    met = table._manifest(v)["metrics"]
    assert met["files_rewritten"] == 0 and met["dv_rows"] == 2
    assert _rows(table.read()) == [(2, "b", None), (4, "d", 40)]
    # purge keeps the evolved values byte-exact
    table.compact()
    assert _rows(table.read()) == [(2, "b", None), (4, "d", 40)]


def test_two_writer_race_across_checkpoint_boundary(spark, tmp_path):
    """Optimistic concurrency with checkpoints in play: two writers
    contend across versions where every other commit also writes a
    checkpoint; exactly one winner per version, and the final snapshot
    (resolved THROUGH a checkpoint) holds every batch exactly once."""
    import threading

    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        ConcurrentCommitError,
    )

    path = str(tmp_path / "cprace")
    VersionedStageTable(
        spark, path, checkpoint_interval=2
    ).overwrite(_df(spark, [(0, "seed")]))
    losses = []

    def writer(tag, keys):
        t = VersionedStageTable(spark, path, checkpoint_interval=2)
        for k in keys:
            batch = _df(spark, [(k, tag)])
            while True:
                try:
                    t.append(batch)
                    break
                except ConcurrentCommitError:
                    losses.append((tag, k))

    t1 = threading.Thread(target=writer, args=("w1", [1, 2, 3]))
    t2 = threading.Thread(target=writer, args=("w2", [11, 12, 13]))
    t1.start(); t2.start(); t1.join(); t2.join()
    t = VersionedStageTable(spark, path, checkpoint_interval=2)
    assert t.latest_version() == 6
    assert t.checkpoints() == [2, 4, 6]
    got = _rows(t.read())
    assert got == [(0, "seed"), (1, "w1"), (2, "w1"), (3, "w1"),
                   (11, "w2"), (12, "w2"), (13, "w2")]
    # mid-history versions resolve through their checkpoint anchors
    assert len(_rows(t.read(3))) == 4


def test_consolidate_dv_merges_sidecars_without_touching_data(spark, table):
    """Many small DV deletes accrete one sidecar each; consolidate_dv
    merges them into ONE (data files byte-identical, mask semantics
    unchanged), old sidecars age out via vacuum, and a balanced table
    is a no-op."""
    table.overwrite(
        _df(spark, [(k, f"v{k}") for k in range(12)]).coalesce(1)
    )
    for k in (1, 3, 5):
        table.delete(f"k = {k}", mode="dv")
    m = table._manifest(table.latest_version())
    old_sidecars = sorted({s for lst in m["dv"].values() for s in lst})
    assert len(old_sidecars) == 3
    sizes = {f: os.path.getsize(table._abs(f)) for f in m["files"]}
    before = _rows(table.read())
    v = table.consolidate_dv()
    m2 = table._manifest(v)
    new_sidecars = sorted({s for lst in m2["dv"].values() for s in lst})
    assert len(new_sidecars) == 1 and not set(new_sidecars) & set(
        old_sidecars
    )
    assert m2["files"] == m["files"]
    assert {
        f: os.path.getsize(table._abs(f)) for f in m2["files"]
    } == sizes
    assert _rows(table.read()) == before
    assert m2["metrics"] == {
        "sidecars_before": 3, "sidecars_after": 1, "dv_files": 1,
    }
    # pre-consolidation versions still read with their own masks
    assert len(_rows(table.read(1))) == 11
    # further DV deletes stack on the consolidated mask
    table.delete("k = 7", mode="dv")
    assert _rows(table.read()) == [
        (k, f"v{k}") for k in range(12) if k not in (1, 3, 5, 7)
    ]
    # vacuum reclaims the old sidecars once unreferenced
    table.vacuum(retain_last=1, data_grace_seconds=0.0)
    assert not any(os.path.exists(table._abs(s)) for s in old_sidecars)
    assert all(os.path.exists(table._abs(s)) for s in new_sidecars)
    assert _rows(table.read()) == [
        (k, f"v{k}") for k in range(12) if k not in (1, 3, 5, 7)
    ]
    # nothing to consolidate: no-op
    table.consolidate_dv()  # one sidecar group post-vacuum state
    v_before = table.latest_version()
    table.compact()  # purge all masks
    assert table.consolidate_dv() == table.latest_version() >= v_before


def test_history_file_counts_across_vacuum_gap(spark, tmp_path):
    """history() accumulates n_files incrementally over delta records;
    after vacuum leaves a non-contiguous version set it must fall back
    to full resolution at each gap rather than applying a delta onto
    the wrong base."""
    t = VersionedStageTable(
        spark, str(tmp_path / "hist"), checkpoint_interval=100
    )
    for k in range(6):
        t.append(_df(spark, [(k, f"v{k}")]).coalesce(1))
    t.tag("old", 1)
    t.vacuum(retain_last=2, data_grace_seconds=0.0)  # survivors: 1 (tagged), 4, 5
    got = {h["version"]: h["n_files"] for h in t.history()}
    assert got == {1: 2, 4: 5, 5: 6}
    # v0 (the bootstrap overwrite) was vacuumed; survivors are appends
    assert [h["op"] for h in t.history()] == ["append"] * 3


def test_lookup_composes_stats_pruning_with_dv(spark, table):
    """lookup() on a clustered table with a deletion vector: stats
    pruning still excludes non-overlapping files (zero IO for them) AND
    the surviving candidate's mask applies — the two skipping layers
    compose instead of one disabling the other."""
    for lo in (0, 100, 200):
        rows = [(lo + i, f"v{lo + i}") for i in range(5)]
        (table.overwrite if lo == 0 else table.append)(
            _df(spark, rows).coalesce(1)
        )
    table.delete("k = 101", mode="dv")
    out = table.lookup("k >= 100 AND k <= 103")
    assert _rows(out) == [(100, "v100"), (102, "v102"), (103, "v103")]
    # only the one overlapping data file (plus its sidecar) is scanned
    data_files = {
        table._rel_path(f)
        for f in out.inputFiles()
        if "/c" in f
    }
    m = table._manifest(table.latest_version())
    candidates = {f for f in data_files if f in set(m["files"])}
    assert len(candidates) == 1
    # the excluded-range lookup still proves empty without any scan
    assert table.lookup("k > 9999").count() == 0


# round-11: columnar checkpoints, snapshot memoization, RLE deletion
# vectors, epoch-idempotent delete, tmp-orphan sweep


def test_manifest_memoized_resolves_log_once(spark, table):
    """Repeated read()/lookup() of the SAME version must pay the log
    resolution (commit records + checkpoint) exactly once — the r10
    verdict's successor bottleneck: at 10^6 files an uncached
    resolution re-parses an O(table) artifact per operation."""
    for k in range(4):
        table.append(_df(spark, [(k, f"v{k}")]).coalesce(1))
    v = table.latest_version()
    table.read(v).collect()
    before = table._log_reads
    table.read(v).collect()
    table.lookup("k = 2", v).collect()
    table.read(v).collect()
    assert table._log_reads == before  # zero further log IO
    # a FRESH instance (cold cache) pays resolution exactly once
    t2 = VersionedStageTable(spark, table.path)
    t2.read(v).collect()
    first = t2._log_reads
    assert first > 0
    t2.read(v).collect()
    t2.lookup("k = 2", v).collect()
    assert t2._log_reads == first


def test_checkpoint_is_columnar_parquet(spark, tmp_path):
    """Checkpoints are parquet: one row per live file with path/stats/dv
    COLUMNS (column-prunable, splittable) and the table-wide schema +
    constraints in the footer key-value metadata — never a monolithic
    JSON the driver re-parses whole."""
    import pyarrow.parquet as pq

    t = VersionedStageTable(
        spark, str(tmp_path / "cpq"), checkpoint_interval=3
    )
    for k in range(4):
        t.append(_df(spark, [(k, f"v{k}")]).coalesce(1))
    assert t.checkpoints() == [3]
    p = t._checkpoint_path(3)
    assert p.endswith(".checkpoint.parquet") and os.path.exists(p)
    # a file-list-only reader prunes to ONE column
    paths = pq.read_table(p, columns=["path"])
    assert paths.num_rows == 4
    meta = pq.read_schema(p).metadata
    assert json.loads(meta[b"schema"].decode())["type"] == "struct"
    # full resolution through the columnar checkpoint is exact
    m = t._manifest(3)
    assert sorted(m["files"]) == sorted(paths.column("path").to_pylist())
    assert set(m["stats"]) == set(m["files"])


def test_checkpoint_failure_never_fails_the_commit(spark, tmp_path):
    """The post-commit checkpoint is derived data: an IO error writing
    it must NOT propagate — the commit is already durable, and a caller
    that retried would double-land its batch. Resolution just anchors
    one checkpoint earlier."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        PosixLinkLogStore,
    )

    class FailingCheckpointStore(PosixLinkLogStore):
        def put_overwrite(self, target, content):
            if ".checkpoint." in os.path.basename(target):
                raise OSError("disk full (injected)")
            super().put_overwrite(target, content)

    t = VersionedStageTable(
        spark, str(tmp_path / "cpf"),
        log_store=FailingCheckpointStore(), checkpoint_interval=2,
    )
    for k in range(4):
        t.append(_df(spark, [(k, f"v{k}")]).coalesce(1))  # v2, v4 fail cp
    assert t.versions() == [0, 1, 2, 3]
    assert t.checkpoints() == []
    assert isinstance(t._last_checkpoint_error, OSError)
    # every version still resolves (from genesis) and reads exactly
    assert _rows(t.read()) == [(k, f"v{k}") for k in range(4)]


def test_footer_stats_all_null_chunk_keeps_other_bounds(spark, table):
    """An all-NULL row group contributes no values (exactly Spark's
    min/max-ignore-NULLs); the file's OTHER row groups must still yield
    bounds instead of degrading the whole column to unknown."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    table.overwrite(_df(spark, [(1, "a")]))
    dest = os.path.join(table.data_dir, "handmade")
    os.makedirs(dest, exist_ok=True)
    f = os.path.join(dest, "part-allnull.parquet")
    # row_group_size=2: rg0 = [None, None] (all-NULL), rg1 = [5, 7]
    pq.write_table(
        pa.table({"c": pa.array([None, None, 5, 7], pa.int64())}),
        f, row_group_size=2,
    )
    out = {}
    rel = os.path.join("data", "handmade", "part-allnull.parquet")
    ok = table._footer_stats(out, [rel], ["c"], {"c": T.LongType()})
    assert ok
    assert out[rel]["c"] == [5, 7]
    # a FULLY all-NULL file stays unknown (never a fake bound)
    f2 = os.path.join(dest, "part-allnull2.parquet")
    pq.write_table(
        pa.table({"c": pa.array([None, None], pa.int64())}), f2
    )
    out2 = {}
    rel2 = os.path.join("data", "handmade", "part-allnull2.parquet")
    assert table._footer_stats(out2, [rel2], ["c"], {"c": T.LongType()})
    assert out2[rel2]["c"] == [None, None]


def test_dv_sidecar_is_run_length_encoded(spark, table):
    """A contiguous-range DV delete's sidecar stores RUNS, not
    positions: bytes sublinear in deleted rows (the roaring-bitmap
    property the 100 TB path needs — a 10^9-row takedown cannot be a
    10^9-row sidecar). Scattered deletes still round-trip exactly."""
    big = spark.range(0, 50_000).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    table.overwrite(big.coalesce(1))
    v = table.delete("k >= 10000 AND k < 40000", mode="dv")
    m = table._manifest(v)
    sidecars = sorted({s for lst in m["dv"].values() for s in lst})
    assert len(sidecars) == 1
    # 30k contiguous masked rows -> ONE run row (bytes ~KB, not 30k rows)
    runs = table._dv_sidecar_runs(sidecars).collect()
    assert len(runs) == 1
    assert (runs[0]["start"], runs[0]["n"]) == (10_000, 30_000)
    assert os.path.getsize(table._abs(sidecars[0])) < 10_000
    assert m["metrics"]["dv_rows"] == 30_000
    assert table.read().count() == 20_000
    # scattered delete: runs of 1, content still exact
    v2 = table.delete("k % 1000 = 7 AND k < 10000", mode="dv")
    assert table.read().count() == 20_000 - 10
    assert _rows(table.lookup("k IN (7, 1007, 9007)")) == []
    assert table._manifest(v2)["metrics"]["dv_rows"] == 10


def test_dv_run_cap_splits_long_runs(spark, table):
    """Runs longer than _DV_RUN_CAP are split at encode time so the
    read-side decode never materializes an unbounded array in one
    task; the split is invisible to every consumer."""
    cap = VersionedStageTable._DV_RUN_CAP
    n = cap + 17
    table.overwrite(
        spark.range(0, n + 5)
        .select(F.col("id").alias("k"))
        .coalesce(1)
    )
    table.delete(f"k < {n}", mode="dv")
    m = table._manifest(table.latest_version())
    sidecars = [s for lst in m["dv"].values() for s in lst]
    runs = sorted(
        (r["start"], r["n"])
        for r in table._dv_sidecar_runs(sidecars).collect()
    )
    assert runs == [(0, cap), (cap, 17)]
    assert _rows(table.read().select("k")) == [
        (k,) for k in range(n, n + 5)
    ]


def test_delete_epoch_idempotent(spark, table):
    """A replayed foreachBatch re-delivers its epoch: the second
    delete(epoch=) must be a NO-OP commit — same version back, no new
    sidecar, identical change feed (the r10 takedown query was only
    semantically idempotent; a replay silently accreted mask rows)."""
    table.overwrite(_df(spark, [(k, f"v{k}") for k in range(6)]).coalesce(1))
    v1 = table.delete("k IN (1, 2)", mode="dv", epoch=901)
    sidecars1 = sorted(
        s for lst in table._manifest(v1)["dv"].values() for s in lst
    )
    feed1 = _rows(table.changes(0, v1))
    # replay: same epoch, same (promised) condition
    assert table.delete("k IN (1, 2)", mode="dv", epoch=901) == v1
    assert table.latest_version() == v1
    assert sorted(
        s for lst in table._manifest(v1)["dv"].values() for s in lst
    ) == sidecars1
    assert _rows(table.changes(0, v1)) == feed1
    # cow mode honors the same contract
    v2 = table.delete("k = 3", epoch=902)
    assert table.delete("k = 3", epoch=902) == v2
    assert table.latest_version() == v2
    assert _rows(table.read()) == [(0, "v0"), (4, "v4"), (5, "v5")]


def test_vacuum_sweeps_stale_tmp_orphans(spark, table):
    """A writer that died between its temp write and the atomic link
    leaves .tmp-* in _log/ forever; vacuum reclaims ones older than the
    grace period and protects fresh (possibly in-flight) ones."""
    table.overwrite(_df(spark, [(1, "a")]))
    table.append(_df(spark, [(2, "b")]))
    stale = os.path.join(table.log_dir, ".tmp-deadbeef.json")
    fresh = os.path.join(table.log_dir, ".tmp-cafef00d.json")
    for p in (stale, fresh):
        with open(p, "w", encoding="utf-8") as fh:
            fh.write("{}")
    os.utime(stale, (1.0, 1.0))  # ancient mtime
    table.vacuum(retain_last=1, data_grace_seconds=0.0)
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # inside the grace period
    assert table.versions() == [1]


def test_epoch_check_is_incremental_not_o_log(spark, table):
    """A streaming writer's per-batch idempotence probe reads only the
    commit records NEWER than its previous probe — never the whole log
    (a 10^4-commit table would otherwise pay 10^4 reads per batch)."""
    table.overwrite(_df(spark, [(0, "seed")]))
    for e in range(1, 6):
        table.append(_df(spark, [(e, f"v{e}")]), epoch=e)
    # prime the scan cursor
    assert table.append(_df(spark, [(99, "x")]), epoch=3) == 3
    before = table._log_reads
    # replay of an already-seen epoch: zero further record reads
    assert table.append(_df(spark, [(99, "x")]), epoch=5) == 5
    assert table._log_reads == before
    # a NEW commit by a second writer is picked up incrementally —
    # exactly one extra record read, and its epoch dedups correctly
    t2 = VersionedStageTable(spark, table.path)
    v7 = t2.append(_df(spark, [(7, "w2")]), epoch=7)
    before = table._log_reads
    assert table.append(_df(spark, [(7, "dup")]), epoch=7) == v7
    assert table._log_reads == before + 1


def test_legacy_json_checkpoint_still_resolves(spark, tmp_path):
    """Pre-r11 tables carry monolithic .checkpoint.json files; the
    columnar reader must fall back to them — resolution anchored at a
    legacy checkpoint reproduces the same snapshot (files, stats, dv)
    the parquet form would."""
    t = VersionedStageTable(
        spark, str(tmp_path / "legacy"), checkpoint_interval=3
    )
    for k in range(5):
        t.append(_df(spark, [(k, f"v{k}")]).coalesce(1))
    t.delete("k = 1", mode="dv")
    # rewrite checkpoint 3 in the LEGACY JSON format and drop the
    # parquet one, as a pre-r11 writer would have left it
    t._snapshot_cache.clear()
    snap = t._manifest(3)
    legacy = os.path.join(t.log_dir, "00000003.checkpoint.json")
    with open(legacy, "w", encoding="utf-8") as fh:
        json.dump(
            {
                "version": 3,
                "files": snap["files"],
                "schema": snap["schema"],
                "constraints": snap.get("constraints") or {},
                # materialize: the r12 lazy stats mapping is not JSON-
                # serializable by design (a legacy writer had dicts)
                "stats": dict((snap.get("stats") or {}).items()),
                "dv": snap.get("dv") or {},
            },
            fh,
        )
    os.remove(t._checkpoint_path(3))
    t2 = VersionedStageTable(spark, t.path, checkpoint_interval=3)
    assert 3 in t2.checkpoints()
    m = t2._manifest(t2.latest_version())
    assert sorted(m["files"]) == sorted(
        t._manifest(t.latest_version())["files"]
    )
    got = _rows(t2.read())
    assert got == [(k, f"v{k}") for k in range(5) if k != 1]
    # stats survived the legacy anchor too
    assert set(m.get("stats") or {}) == set(m["files"])


# -- protocol table features ----------------------------------------------


def test_protocol_derived_from_commit_content(spark, table):
    """Feature-free tables carry NO protocol; a DV delete makes the
    manifest require the deletion-vector reader features from that
    version on (monotone), and an epoch commit adds its writer
    feature."""
    table.overwrite(_df(spark, [(i, "x") for i in range(10)]).coalesce(1))
    assert table.protocol() == {}
    table.delete("k < 3", mode="dv")
    p = table.protocol()
    assert set(p["reader"]) == {"deletion-vectors", "rle-deletion-vectors"}
    table.append(_df(spark, [(99, "z")]), epoch=5)
    assert "txn-epochs" in table.protocol()["writer"]
    # monotone: compaction purges the masks but the features stay
    table.compact()
    assert "deletion-vectors" in table.protocol()["reader"]


def _plant_future_record(table, *, reader=(), writer=()):
    """Hand-craft a next-version commit record requiring features this
    engine does not implement — simulates a table a NEWER engine wrote."""
    v = table.latest_version() + 1
    rec = {
        "version": v,
        "op": "append",
        "add": [],
        "remove": [],
        "schema": table._manifest(table.latest_version())["schema"],
        "committed_at": 0.0,
        "protocol": {"reader": list(reader), "writer": list(writer)},
    }
    target = os.path.join(table.log_dir, f"{v:08d}.json")
    assert table.log_store.put_if_absent(target, json.dumps(rec))
    return v


def test_unknown_reader_feature_fails_closed(spark, table):
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        TableFeatureError,
    )

    v0 = table.overwrite(_df(spark, [(1, "a")]))
    v1 = _plant_future_record(table, reader=["v9-frobnicated-masks"])
    with pytest.raises(TableFeatureError, match="v9-frobnicated-masks"):
        table.read(v1)
    with pytest.raises(TableFeatureError):
        table.read()  # latest resolves through the future record
    # versions BEFORE the future feature stay readable
    assert _rows(table.read(v0)) == [(1, "a")]


def test_unknown_writer_feature_blocks_writes_not_reads(spark, table):
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        TableFeatureError,
    )

    table.overwrite(_df(spark, [(1, "a")]))
    _plant_future_record(table, writer=["auto-compaction-v2"])
    # a pure reader may ignore writer features
    assert _rows(table.read()) == [(1, "a")]
    # but committing could break the invariant the feature maintains
    with pytest.raises(TableFeatureError, match="auto-compaction-v2"):
        table.append(_df(spark, [(2, "b")]))
    with pytest.raises(TableFeatureError):
        table.delete("k = 1")


def test_protocol_survives_checkpoint_anchor(spark, tmp_path):
    """Resolution anchored at a checkpoint must still see features
    declared BEFORE it — the checkpoint carries the accumulated
    protocol in its footer metadata."""
    t = VersionedStageTable(spark, str(tmp_path / "vt"),
                            checkpoint_interval=2)
    t.overwrite(_df(spark, [(i, "x") for i in range(10)]).coalesce(1))
    t.delete("k < 2", mode="dv")          # v1: declares dv features
    t.append(_df(spark, [(50, "y")]))     # v2: checkpointed
    t.append(_df(spark, [(51, "y")]))     # v3
    assert 2 in t.checkpoints()
    fresh = VersionedStageTable(spark, str(tmp_path / "vt"),
                                checkpoint_interval=2)
    # fresh instance resolves v3 from the v2 checkpoint + one delta:
    # the dv feature from v1 must survive the anchor hop
    assert "deletion-vectors" in fresh.protocol()["reader"]


# -- incremental zorder clustering ------------------------------------------


def test_incremental_zorder_clusters_only_the_tail(spark, table):
    import random as _random

    rng = _random.Random(7)
    rows = [(k, "v") for k in rng.sample(range(1000), 60)]
    table.overwrite(_df(spark, rows).repartition(3))
    v_full = table.compact(zorder_by=["k"], target_files=4)
    base = set(table._manifest(v_full)["files"])
    table.append(_df(spark, [(2000 + i, "t1") for i in range(10)]))
    table.append(_df(spark, [(3000 + i, "t2") for i in range(10)]))
    n_before = table.read().count()
    v_inc = table.compact(zorder_by=["k"], incremental=True)
    m = table._manifest(v_inc)
    met = m["metrics"]
    # the clustered base carried over BY NAME — zero IO for it
    assert base <= set(m["files"])
    assert met["incremental"] is True
    assert met["files_carried"] >= len(base)
    assert met["files_clustered"] == len(
        set(table._manifest(v_inc - 1)["files"]) - base
    )
    assert table.read().count() == n_before
    # a second pass with nothing new is a no-op
    assert table.compact(zorder_by=["k"], incremental=True) == v_inc


def test_incremental_zorder_without_prior_full_is_full(spark, table):
    table.overwrite(_df(spark, [(k, "v") for k in range(30)]).repartition(3))
    v = table.compact(zorder_by=["k"], target_files=2, incremental=True)
    met = table._manifest(v)["metrics"]
    # no anchor: the whole snapshot is the tail
    assert met["incremental"] is False
    assert met["files_carried"] == 0
    assert table.read().count() == 30


def test_incremental_zorder_anchor_keys_on_columns(spark, table):
    """A zorder on DIFFERENT columns is not an anchor: clustering by k
    after a cluster by v re-clusters everything."""
    table.overwrite(
        spark.createDataFrame(
            [(k, "s%02d" % (k % 7)) for k in range(40)], "k int, v string"
        ).repartition(3)
    )
    table.compact(zorder_by=["v"], target_files=3)
    v = table.compact(zorder_by=["k"], incremental=True)
    met = table._manifest(v)["metrics"]
    assert met["incremental"] is False and met["files_carried"] == 0


def test_incremental_zorder_rebases_over_base_file_rewrite(spark, tmp_path):
    """Unlike a full ZORDER (whole-snapshot read set), the incremental
    pass reads only the tail — a concurrent COW delete that rewrites a
    BASE file is no conflict: the rebased commit lands and the
    winner's rewrite simply joins the next tail."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        PosixLinkLogStore,
    )

    class RaceOnce(PosixLinkLogStore):
        def __init__(self, fn):
            self.fn, self.fired = fn, False

        def put_if_absent(self, target, content):
            if not self.fired:
                self.fired = True
                self.fn()
            return super().put_if_absent(target, content)

    path = str(tmp_path / "vt")
    other = VersionedStageTable(spark, path)
    other.overwrite(_df(spark, [(k, "v") for k in range(40)]).repartition(2))
    other.compact(zorder_by=["k"], target_files=4)
    other.append(_df(spark, [(5000, "tail")]))
    victim = VersionedStageTable(
        spark, path, log_store=RaceOnce(lambda: other.delete("k = 3"))
    )
    n = other.read().count()
    v = victim.compact(zorder_by=["k"], incremental=True)
    assert victim._manifest(v)["metrics"]["incremental"] is True
    got = {r["k"] for r in victim.read().collect()}
    assert 3 not in got and 5000 in got and len(got) == n - 1


def test_delete_keys_one_commit_pruned(spark, table):
    """k victim keys = ONE commit and a key-bounds-pruned rewrite —
    the keyed twin of predicate DELETE (change-feed appliers must
    never loop per key)."""
    table.overwrite(
        _df(spark, [(k, "x") for k in range(100)]).repartition(4)
    )
    table.compact(zorder_by=["k"], target_files=4)
    v0 = table.latest_version()
    victims = spark.createDataFrame([(k,) for k in range(5, 15)], "k int")
    v = table.delete_keys(victims, ["k"])
    assert v == v0 + 1  # exactly one commit for 10 victims
    m = table._manifest(v)
    met = m["metrics"]
    assert met["files_candidate"] < met["files_total"]  # bounds pruned
    got = {r["k"] for r in table.read().collect()}
    assert got == set(range(100)) - set(range(5, 15))
    # replay with the same epoch is a no-op
    v2 = table.delete_keys(victims, ["k"], epoch=3)
    v3 = table.delete_keys(victims, ["k"], epoch=3)
    assert v3 == v2  # nothing matched the 2nd time anyway, but pinned
    # no matching key: version unchanged, no commit
    far = spark.createDataFrame([(10_000,)], "k int")
    assert table.delete_keys(far, ["k"]) == table.latest_version()


def test_clustered_append_lands_disjoint_ranges(spark, table):
    """append(cluster=True) on a zordered table: the batch's files
    carry DISJOINT cluster-key ranges (sharp stats without waiting for
    maintenance); the next incremental pass still treats them as tail,
    and a table never clustered appends plainly (no-op flag)."""
    import random as _random

    rng = _random.Random(11)
    table.overwrite(_df(spark, [(k, "x") for k in range(100)]))
    table.compact(zorder_by=["k"], target_files=4)
    batch = [(1000 + k, "c") for k in rng.sample(range(400), 120)]
    v = table.append(_df(spark, batch).repartition(5), cluster=True,
                     cluster_files=3)
    m = table._manifest(v)
    assert m["metrics"] == {"clustered": True, "files": 3}
    new = [f for f in m["files"]
           if f not in set(table._manifest(v - 1)["files"])]
    stats = m["stats"]
    ranges = sorted(tuple(stats[f]["k"]) for f in new)
    assert len(ranges) == 3
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint: range partitioning did its job
    # the appended range prunes without any maintenance pass
    from pyspark.sql import types as T

    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        prune_candidate_files, _stat_columns,
    )
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    cand = prune_candidate_files(
        m["files"], stats, f"k >= {ranges[2][0]}",
        stat_cols=set(_stat_columns(schema)),
    )
    assert set(cand) <= set(new) and len(cand) < len(m["files"])
    # never-clustered table: cluster=True is a plain append
    t2 = VersionedStageTable(spark, table.path + "2")
    t2.overwrite(_df(spark, [(1, "a")]))
    v2 = t2.append(_df(spark, [(2, "b")]), cluster=True)
    assert "metrics" not in t2._manifest(v2)


def test_compact_where_scopes_the_binpack(spark, table):
    """OPTIMIZE WHERE: only stats-matching small files enter the
    rewrite; the cold region's files carry over by name untouched."""
    table.overwrite(_df(spark, [(k, "lo") for k in range(10)]).coalesce(1))
    table.append(_df(spark, [(k, "lo2") for k in range(10, 20)]).coalesce(1))
    table.append(
        _df(spark, [(k, "hi") for k in range(1000, 1010)]).coalesce(1)
    )
    table.append(
        _df(spark, [(k, "hi2") for k in range(1010, 1020)]).coalesce(1)
    )
    before = set(table._manifest(table.latest_version())["files"])
    v = table.compact(where="k >= 1000")
    m = table._manifest(v)
    # the two hot files packed into one; both cold files untouched
    assert m["metrics"]["files_compacted"] == 2
    cold_kept = {f for f in before if f in set(m["files"])}
    assert len(cold_kept) == 2
    got = {r["k"] for r in table.read().collect()}
    assert got == set(range(20)) | set(range(1000, 1020))
    # a scope with nothing to pack is a no-op
    assert table.compact(where="k < 0") == v


def test_changes_by_commit_stamps_each_commit(spark, table):
    """Per-commit CDF: rows carry the commit that produced them, and
    the per-step union refines changes() — a row inserted then deleted
    INSIDE the range nets out of changes() but shows under both
    commits here."""
    table.overwrite(_df(spark, [(1, "a")]))           # v0
    table.append(_df(spark, [(2, "transient")]))      # v1
    table.delete("k = 2")                             # v2
    table.append(_df(spark, [(3, "c")]))              # v3
    feed = table.changes_by_commit(0, 3)
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["k"])
        for r in feed.collect()
    )
    assert rows == [
        (1, "insert", 2),
        (2, "delete", 2),
        (3, "insert", 3),
    ]
    # timestamps come from the records and are non-decreasing
    ts = [
        r["_commit_timestamp"]
        for r in feed.select("_commit_version", "_commit_timestamp")
        .distinct().orderBy("_commit_version").collect()
    ]
    assert ts == sorted(ts)
    # the collapsed feed nets the transient row out
    net = sorted(
        (r["_change_type"], r["k"])
        for r in table.changes(0, 3).collect()
    )
    assert net == [("insert", 3)]


def test_changes_by_commit_across_schema_evolution(spark, table):
    """A merge_schema append inside the range widens later steps'
    schemas; earlier steps NULL-backfill the new column instead of
    failing the union."""
    table.overwrite(_df(spark, [(1, "a")]))
    table.append(_df(spark, [(2, "b")]))
    table.append(
        spark.createDataFrame([(3, "c", 1.5)], "k int, v string, w double"),
        merge_schema=True,
    )
    rows = sorted(
        (r["_commit_version"], r["k"], r["w"])
        for r in table.changes_by_commit(0, 2).collect()
    )
    assert rows == [(1, 2, None), (2, 3, 1.5)]


def test_rebase_refuses_winner_with_unknown_features(spark, tmp_path):
    """A winner whose record declares features this engine lacks must
    STOP the rebase (the pre-commit writer gate checked only the stale
    base snapshot)."""
    import json as _json

    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        PosixLinkLogStore, TableFeatureError,
    )

    path = str(tmp_path / "vt")
    other = VersionedStageTable(spark, path)

    def plant_future():
        v = other.latest_version() + 1
        rec = {
            "version": v, "op": "append", "add": [], "remove": [],
            "schema": other._manifest(other.latest_version())["schema"],
            "committed_at": 0.0,
            "protocol": {"reader": [], "writer": ["future-w"]},
        }
        other.log_store.put_if_absent(
            os.path.join(other.log_dir, f"{v:08d}.json"), _json.dumps(rec)
        )

    class RaceOnce(PosixLinkLogStore):
        def __init__(self):
            self.fired = False

        def put_if_absent(self, target, content):
            if not self.fired:
                self.fired = True
                plant_future()
            return super().put_if_absent(target, content)

    other.overwrite(_df(spark, [(1, "a")]))
    victim = VersionedStageTable(spark, path, log_store=RaceOnce())
    with pytest.raises(TableFeatureError, match="future-w"):
        victim.append(_df(spark, [(2, "b")]))


def test_genesis_epoch_race_adopts_winner(spark, tmp_path):
    """Two writers racing the SAME epoch onto an EMPTY table: the loser
    adopts the winner's version 0 instead of raising."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        PosixLinkLogStore,
    )

    path = str(tmp_path / "vt")
    other = VersionedStageTable(spark, path)

    class RaceOnce(PosixLinkLogStore):
        def __init__(self):
            self.fired = False

        def put_if_absent(self, target, content):
            if not self.fired:
                self.fired = True
                other.append(_df(spark, [(1, "once")]), epoch=7)
            return super().put_if_absent(target, content)

    victim = VersionedStageTable(spark, path, log_store=RaceOnce())
    v = victim.append(_df(spark, [(1, "once")]), epoch=7)
    assert v == 0 == victim.latest_version()
    assert _rows(victim.read()) == [(1, "once")]


def test_epoch_toctou_same_epoch_winner_between_probe_and_commit(
    spark, tmp_path
):
    """ADVICE r11 (medium): a same-epoch commit landing BETWEEN the
    caller's idempotence probe and its snapshot read used to make the
    loser's put_if_absent target a fresh version and SUCCEED — the
    batch landed twice. _commit now re-scans the epoch immediately
    before the commit point, so the loser adopts the winner instead."""
    path = str(tmp_path / "vt")
    other = VersionedStageTable(spark, path)
    other.overwrite(_df(spark, [(1, "base")]))
    victim = VersionedStageTable(spark, path)

    fired = {"done": False}
    orig = victim.latest_version

    def hooked():
        # the hostile interleaving: the winner lands THIS batch (same
        # epoch) after victim's append() already probed the epoch map
        # but before it reads its base snapshot
        if not fired["done"]:
            fired["done"] = True
            other.append(_df(spark, [(2, "batch")]), epoch=42)
        return orig()

    victim.latest_version = hooked
    v = victim.append(_df(spark, [(2, "batch")]), epoch=42)
    assert v == other.latest_version() == 1
    # the batch landed exactly ONCE
    assert _rows(victim.read()) == [(1, "base"), (2, "batch")]


def test_vacuum_default_grace_protects_inflight_writers(spark, table):
    """ADVICE r11 (medium): a default-arg vacuum must NOT reclaim
    just-written unreferenced parquet — a concurrent writer writes its
    files BEFORE linking its commit record, and deleting them would
    publish a manifest referencing missing files. Explicit 0.0 keeps
    the deterministic immediate-reclaim behavior."""
    table.overwrite(_df(spark, [(1, "a")]))
    table.overwrite(_df(spark, [(2, "b")]))
    out = table.vacuum(retain_last=1)  # default grace: fresh files survive
    assert out["files_deleted"] == 0
    # the files are physically still there even though v0's record is gone
    out2 = table.vacuum(retain_last=1, data_grace_seconds=0.0)
    assert out2["files_deleted"] >= 1


def test_compact_incremental_without_zorder_raises(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="incremental"):
        table.compact(incremental=True)


def test_compact_zorder_honors_where_scope(spark, table):
    """compact(zorder_by=..., where=...) re-clusters ONLY the
    predicate's stats-candidate files; cold files carry over by name
    (it used to silently ignore `where` and rewrite everything)."""
    lo = spark.range(0, 100).select(
        F.col("id").cast("int").alias("k"), F.lit("lo").alias("v")
    )
    hi = spark.range(1000, 1100).select(
        F.col("id").cast("int").alias("k"), F.lit("hi").alias("v")
    )
    table.overwrite(lo.coalesce(1))
    table.append(hi.coalesce(2))
    before = set(table._manifest(table.latest_version())["files"])
    v = table.compact(zorder_by=["k"], where="k >= 1000")
    m = table._manifest(v)
    # the lo file survived untouched; the hi files were re-clustered
    assert m["metrics"]["files_clustered"] == 2
    lo_files = {f for f in before if f in set(m["files"])}
    assert len(lo_files) == 1
    assert _rows(table.read()) == _rows(lo.unionByName(hi))
    # a predicate matching nothing is a no-op commit-wise
    assert table.compact(zorder_by=["k"], where="k < 0") == v


def test_changes_by_commit_timestamp_is_timestamp_typed(spark, table):
    """ADVICE r11 (low): Delta CDF's _commit_timestamp is a TIMESTAMP
    column; consumers ported from the reference type against that."""
    from pyspark.sql import types as T

    table.overwrite(_df(spark, [(1, "a")]))
    table.append(_df(spark, [(2, "b")]))
    feed = table.changes_by_commit(0, 1)
    assert isinstance(
        feed.schema["_commit_timestamp"].dataType, T.TimestampType
    )
    ts = [r["_commit_timestamp"] for r in feed.collect()]
    assert all(t is not None for t in ts)


def test_checkpoint_stats_column_is_lazily_loaded(spark, tmp_path):
    """Verdict r11 task #2: file-list-only resolutions off a columnar
    checkpoint (read / changes / vacuum) must never deserialize the
    per-file stats column — at 10^6 files that column IS the driver
    width. Only a pruning caller (lookup/merge/delete) pays the load,
    exactly once per resolved snapshot."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    lo = spark.createDataFrame(
        [(i, "lo") for i in range(10)], "k int, v string"
    )
    hi = spark.createDataFrame(
        [(i, "hi") for i in range(1000, 1010)], "k int, v string"
    )
    t.overwrite(lo.coalesce(1))                    # v0
    t.append(hi.coalesce(1))                       # v1
    t.merge(_df(spark, [(3, "X")]), ["k"])         # v2
    t.append(_df(spark, [(77, "y")]))              # v3 -> checkpoint
    t.append(_df(spark, [(78, "z")]))              # v4
    assert t.checkpoints() == [3]

    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    # file-list-only paths: zero stats-column loads
    assert fresh.read().count() == 22
    assert fresh.read(3).count() == 21
    assert fresh.changes(3, 4).count() == 1
    assert fresh._stats_loads == 0
    # a pruning path loads the column exactly once per snapshot...
    got = fresh.lookup("k >= 1000")
    assert got.count() == 10
    assert fresh._stats_loads == 1
    # ...and the memoized snapshot never re-loads
    assert fresh.lookup("k >= 1000").count() == 10
    assert fresh._stats_loads == 1
    # stats survive the lazy path intact: a merge prunes candidates off
    # checkpoint-resident bounds and the result is exact
    fresh.merge(_df(spark, [(1005, "H")]), ["k"])
    assert fresh.lookup("k = 1005").first()["v"] == "H"
    # vacuum keeping only the checkpointed head: reference walk only
    t2 = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    t2.append(_df(spark, [(99, "w")]))             # v6 -> checkpoint
    assert t2.latest_version() == 6 and 6 in t2.checkpoints()
    t3 = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    # the kept head resolves off its own checkpoint: the reference
    # walk needs files+dv only — zero stats-column loads
    t3.vacuum(retain_last=1, data_grace_seconds=0.0)
    assert t3._stats_loads == 0


def test_lazy_checkpoint_stats_rewrite_roundtrip(spark, tmp_path):
    """A checkpoint re-written FROM a lazily-resolved snapshot (the
    raw_json passthrough) carries identical bounds: pruning off the
    second-generation checkpoint still skips the disjoint file."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=2
    )
    lo = spark.createDataFrame(
        [(i, "lo") for i in range(10)], "k int, v string"
    )
    hi = spark.createDataFrame(
        [(i, "hi") for i in range(1000, 1010)], "k int, v string"
    )
    t.overwrite(lo.coalesce(1))                    # v0
    t.append(hi.coalesce(1))                       # v1
    t.append(_df(spark, [(50, "m")]))              # v2 -> checkpoint
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=2
    )
    fresh.append(_df(spark, [(51, "n")]))          # v3
    fresh.append(_df(spark, [(52, "o")]))          # v4 -> checkpoint,
    #                     written off the lazily-resolved v4 snapshot
    assert 4 in fresh.checkpoints()
    reader = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=2
    )
    m = reader._manifest(4)
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        _stat_columns,
        prune_candidate_files,
    )
    import json as _json
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(_json.loads(m["schema"]))
    cands = prune_candidate_files(
        m["files"], m.get("stats") or {}, "k >= 1000",
        stat_cols=set(_stat_columns(schema)),
    )
    assert len(cands) == 1
    assert reader.lookup("k >= 1000").count() == 10


def test_dv_encode_window_is_chunk_partitioned(spark, table):
    """Verdict r11 task #10: the RLE encoder's gaps-and-islands window
    must partition by (file_name, cap-chunk), never by file alone — a
    10^9-row single-file takedown would otherwise sort the whole
    victim set in ONE task (a window partition cannot be split by
    AQE). Pins the plan shape and the run-cap invariant."""
    positions = spark.createDataFrame(
        [("f1.parquet", i) for i in range(100)]
        + [("f2.parquet", i) for i in range(5)],
        "file_name string, row_index long",
    )
    table.overwrite(_df(spark, [(1, "a")]))  # just to build the helper
    runs = table._encode_dv_runs(positions)
    plan = runs._jdf.queryExecution().executedPlan().toString()
    import re as _re

    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    assert all(
        "file_name" in s and "__chunk" in s for s in specs
    ), specs
    # the run-cap bound now falls out of the chunking itself
    got = runs.collect()
    assert all(r["n"] <= table._DV_RUN_CAP for r in got)
    assert sorted(
        (r["file_name"], r["start"], r["n"]) for r in got
    ) == [("f1.parquet", 0, 100), ("f2.parquet", 0, 5)]


def test_dv_encode_runs_split_only_at_cap_boundaries(spark, table):
    """A contiguous run longer than the cap splits at cap-aligned
    boundaries (bounded decode per sidecar row), and round-trips."""
    table.overwrite(_df(spark, [(1, "a")]))
    table._DV_RUN_CAP = 16  # shrink for the test
    n = 40
    positions = spark.createDataFrame(
        [("f.parquet", i) for i in range(3, 3 + n)],
        "file_name string, row_index long",
    )
    runs = sorted(
        (r["start"], r["n"])
        for r in table._encode_dv_runs(positions).collect()
    )
    assert all(cnt <= 16 for _, cnt in runs)
    # cap-aligned: every run except possibly the first starts on a
    # multiple of the cap
    assert all(s % 16 == 0 for s, _ in runs[1:])
    assert sum(cnt for _, cnt in runs) == n
    # decode reproduces the exact position set
    back = sorted(
        r["row_index"]
        for r in spark.createDataFrame(
            [("f.parquet", s, c) for s, c in runs],
            "file_name string, start long, n long",
        )
        .select(
            F.explode(
                F.sequence(
                    F.col("start"),
                    F.col("start") + F.col("n") - F.lit(1),
                )
            ).alias("row_index")
        )
        .collect()
    )
    assert back == list(range(3, 3 + n))


def test_lookup_materializes_only_pruned_files_from_checkpoint(
    spark, tmp_path
):
    """The 10^6-file driver-width successor to lazy stats: a pruned
    lookup on a checkpoint-anchored table must materialize into driver
    Python ONLY the candidate files — the checkpoint streams through
    the bounds test, non-candidates never become Python objects. Pinned
    by the _files_materialized counter; results stay exact vs the full
    scan, chain deltas past the anchor prune identically, and repeated
    identical lookups hit the partial-snapshot memo (no re-stream)."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    # four disjoint single-file ranges, checkpoint lands at v3
    for i, lo in enumerate((0, 100, 200, 300)):
        rows = [(lo + j, f"v{lo + j}") for j in range(5)]
        (t.overwrite if i == 0 else t.append)(_df(spark, rows).coalesce(1))
    assert t.checkpoints() == [3]
    # chain delta past the anchor: one more disjoint file at v4
    t.append(_df(spark, [(400 + j, f"v{400 + j}") for j in range(5)])
             .coalesce(1))

    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    out = fresh.lookup("k >= 100 AND k <= 102")
    assert _rows(out) == [(100, "v100"), (101, "v101"), (102, "v102")]
    # exactly ONE file (the 100-range) became driver Python — not the
    # checkpoint's four, not the table's five
    assert fresh._files_materialized == 1
    assert len(out.inputFiles()) == 1
    # a chain-delta file is pruned by its RECORD stats the same way
    assert _rows(fresh.lookup("k = 401")) == [(401, "v401")]
    assert fresh._files_materialized == 2
    # repeated identical lookup: partial-snapshot memo, zero re-streams
    loads = fresh._stats_loads
    assert _rows(fresh.lookup("k = 401")) == [(401, "v401")]
    assert fresh._stats_loads == loads and fresh._files_materialized == 2
    # proven-empty range: zero files materialized, schema intact
    empty = fresh.lookup("k > 9999")
    assert empty.count() == 0 and empty.columns == ["k", "v"]
    assert fresh._files_materialized == 2
    # unprunable predicate falls back to the full path, results exact
    assert len(_rows(fresh.lookup("k % 100 = 3"))) == 5
    # and once the FULL snapshot is cached, lookups reuse it in memory:
    # the cached lazy stats pay their one load on first access, then
    # further pruned lookups are free
    before = fresh._stats_loads
    assert _rows(fresh.lookup("k = 201")) == [(201, "v201")]
    assert fresh._stats_loads == before + 1
    assert _rows(fresh.lookup("k = 202")) == [(202, "v202")]
    assert fresh._stats_loads == before + 1


def test_pruned_lookup_respects_dv_and_removes_past_anchor(
    spark, tmp_path
):
    """Chain records AFTER the checkpoint anchor that delete rows (DV
    sidecars) or rewrite files (COW) must reach the pruned partial
    snapshot: a lookup must never resurrect rows a post-anchor commit
    deleted."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    for i, lo in enumerate((0, 100, 200, 300)):
        rows = [(lo + j, f"v{lo + j}") for j in range(5)]
        (t.overwrite if i == 0 else t.append)(_df(spark, rows).coalesce(1))
    assert t.checkpoints() == [3]
    t.delete("k = 101", mode="dv")    # v4: DV on the 100-range file
    t.delete("k = 303")               # v5: COW rewrite of the 300-range
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    assert _rows(fresh.lookup("k >= 100 AND k <= 102")) == [
        (100, "v100"), (102, "v102")
    ]
    assert _rows(fresh.lookup("k >= 300")) == [
        (300, "v300"), (301, "v301"), (302, "v302"), (304, "v304")
    ]
    # time travel through the pruned path still sees the old rows
    assert (101, "v101") in _rows(fresh.lookup("k <= 101", version=3))


def test_keyed_writes_materialize_only_candidate_files(spark, tmp_path):
    """MERGE and delete_keys on a checkpoint-anchored table resolve a
    keyed PARTIAL snapshot: only envelope-surviving candidate files
    become driver Python (the same O(candidates) contract pruned
    lookups pin), while the commit still records the FULL live-file
    count in its metrics and untouched files carry over by name."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    for i, lo in enumerate((0, 100, 200, 300)):
        rows = [(lo + j, f"v{lo + j}") for j in range(5)]
        (t.overwrite if i == 0 else t.append)(_df(spark, rows).coalesce(1))
    assert t.checkpoints() == [3]
    t.append(_df(spark, [(400 + j, f"v{400 + j}") for j in range(5)])
             .coalesce(1))  # v4: chain delta past the anchor

    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    v = fresh.merge(_df(spark, [(201, "M"), (203, "M")]), ["k"])
    # exactly ONE file (the 200-range) became driver Python
    assert fresh._files_materialized == 1
    m = fresh._commit_record(v)["metrics"]
    assert m["files_total"] == 5 and m["files_candidate"] == 1
    assert m["files_rewritten"] == 1
    got = {r["k"]: r["v"] for r in fresh.read().collect()}
    assert got[201] == "M" and got[203] == "M" and got[202] == "v202"
    assert len(got) == 25

    fresh2 = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    v2 = fresh2.delete_keys(
        spark.createDataFrame([(400,), (404,)], "k int"), ["k"]
    )
    # the chain-delta 400-range file is the only candidate; the merge
    # commit (v5) is also a chain delta judged by record stats
    assert fresh2._files_materialized <= 2
    m2 = fresh2._commit_record(v2)["metrics"]
    # files_total tracks the FULL live count pre-delete (the merge may
    # have split its rewrite across several files), counted without
    # materializing paths
    assert m2["files_candidate"] <= 2
    assert m2["files_total"] == len(t._manifest(v2 - 1)["files"])
    got2 = sorted(r["k"] for r in fresh2.read().collect())
    assert 400 not in got2 and 404 not in got2 and len(got2) == 23


def _checkpointed_four_ranges(spark, tmp_path):
    """Four disjoint single-file ranges with the checkpoint at v3, plus
    one chain-delta file at v4 — the shared fixture shape of the
    driver-width counter tests."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    for i, lo in enumerate((0, 100, 200, 300)):
        rows = [(lo + j, f"v{lo + j}") for j in range(5)]
        (t.overwrite if i == 0 else t.append)(_df(spark, rows).coalesce(1))
    assert t.checkpoints() == [3]
    t.append(_df(spark, [(400 + j, f"v{400 + j}") for j in range(5)])
             .coalesce(1))
    return t


def test_conditional_delete_materializes_only_candidates(spark, tmp_path):
    """delete(condition) on a checkpoint-anchored table resolves the
    predicate-pruned PARTIAL snapshot: only bounds-surviving candidate
    files become driver Python, while the commit's metrics still carry
    the FULL live-file count — the same O(candidates) contract the
    keyed writes pin, now on the predicate path."""
    t = _checkpointed_four_ranges(spark, tmp_path)
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    v = fresh.delete("k >= 100 AND k <= 102")
    # exactly ONE file (the 100-range) became driver Python
    assert fresh._files_materialized == 1
    m = fresh._commit_record(v)["metrics"]
    assert m["files_total"] == 5 and m["files_candidate"] == 1
    assert m["files_rewritten"] == 1
    got = sorted(r["k"] for r in fresh.read().collect())
    assert got == sorted(
        k for k in range(0, 5)
    ) + list(range(103, 105)) + list(range(200, 205)) + list(
        range(300, 305)
    ) + list(range(400, 405))

    # DV mode prunes through the same partial snapshot
    fresh2 = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    v2 = fresh2.delete("k = 201", mode="dv")
    # the 200-range checkpoint file + possibly the delete's own chain
    # rewrite judged by record stats
    assert fresh2._files_materialized <= 2
    m2 = fresh2._commit_record(v2)["metrics"]
    assert m2["files_rewritten"] == 0 and m2["dv_rows"] == 1
    assert m2["files_total"] == len(t._manifest(v2 - 1)["files"])
    assert 201 not in {r["k"] for r in fresh2.read().collect()}


def test_read_where_columns_scoped(spark, tmp_path):
    """read(where=..., columns=...) scans only the stats-surviving
    candidate files (partial manifest resolution) and projects the
    listed columns; the predicate may reference non-projected columns,
    and unknown columns raise."""
    _checkpointed_four_ranges(spark, tmp_path)
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    out = fresh.read(where="k >= 100 AND k <= 102", columns=["v"])
    assert out.columns == ["v"]
    assert sorted(r["v"] for r in out.collect()) == ["v100", "v101", "v102"]
    # only the 100-range file materialized driver-side and entered the plan
    assert fresh._files_materialized == 1
    assert len(out.inputFiles()) == 1
    # projection without predicate; predicate without projection
    assert fresh.read(columns=["k"]).columns == ["k"]
    assert fresh.read(where="k = 401").count() == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="nope"):
        fresh.read(columns=["nope"])


def test_changes_resolves_from_chain_records(spark, tmp_path):
    """The change feed between two checkpoint-anchored versions comes
    from the polled delta records alone: an append-only poll
    materializes ZERO manifest entries into driver Python, and a poll
    spanning a COW delete materializes exactly the removed files (their
    m0 deletion vectors resolve as a path-filtered partial)."""
    t = _checkpointed_four_ranges(spark, tmp_path)
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    feed = fresh.changes(3, 4)
    rows = {(r["k"], r["_change_type"]) for r in feed.collect()}
    assert rows == {(400 + j, "insert") for j in range(5)}
    assert fresh._files_materialized == 0  # pure chain diff

    t.delete("k = 303")  # v5: COW rewrite of the 300-range file
    fresh2 = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    feed2 = fresh2.changes(4, 5)
    rows2 = {(r["k"], r["_change_type"]) for r in feed2.collect()}
    assert rows2 == {(303, "delete")}
    # exactly the removed 300-range file materialized (path-filtered m0)
    assert fresh2._files_materialized == 1

    # a DV delete surfaces through the fresh-sidecar arm, still O(delta)
    t.delete("k = 101", mode="dv")  # v6
    fresh3 = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    feed3 = fresh3.changes(5, 6)
    assert {(r["k"], r["_change_type"]) for r in feed3.collect()} == {
        (101, "delete")
    }
    assert fresh3._files_materialized == 0  # no file left either manifest


def test_changes_chain_path_matches_two_manifest_diff(spark, tmp_path):
    """Equivalence pin: across a mixed commit run (append, merge,
    COW delete, DV delete, restore) every single-step feed computed by
    the chain path equals the two-manifest diff the full path computes
    (forced by caching the full snapshots first)."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=2
    )
    t.overwrite(_df(spark, [(i, f"a{i}") for i in range(6)]).coalesce(1))
    t.append(_df(spark, [(10 + i, f"b{i}") for i in range(4)]).coalesce(1))
    t.merge(_df(spark, [(2, "M2"), (99, "M99")]), ["k"])
    t.delete("k = 11")
    t.delete("k = 3", mode="dv")
    t.restore(2)
    head = t.latest_version()
    for v in range(0, head):
        fresh = VersionedStageTable(
            spark, str(tmp_path / "vt"), checkpoint_interval=1000
        )
        got = sorted(
            (r["k"], r["v"], r["_change_type"])
            for r in fresh.changes(v, v + 1).collect()
        )
        # force the full two-manifest path by pre-caching both snapshots
        full = VersionedStageTable(
            spark, str(tmp_path / "vt"), checkpoint_interval=1000
        )
        full._manifest(v)
        full._manifest(v + 1)
        want = sorted(
            (r["k"], r["v"], r["_change_type"])
            for r in full.changes(v, v + 1).collect()
        )
        assert got == want, f"step {v}->{v + 1}"


def test_incremental_zorder_header_only_resolution(spark, tmp_path):
    """The steady-state maintenance pass — incremental ZORDER on a
    checkpoint-anchored, previously-clustered table — resolves ZERO
    manifest entries into driver Python: table singletons and the live
    count come from the checkpoint footer (header-only partial), the
    tail and its masks from the chain records since the last cluster."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    t.overwrite(_df(spark, [(i, f"a{i}") for i in range(20)]))
    t.compact(zorder_by=["k"], target_files=2)  # v1: full cluster
    t.append(_df(spark, [(100 + i, f"b{i}") for i in range(6)])
             .coalesce(1))  # v2
    t.append(_df(spark, [(200 + i, f"c{i}") for i in range(6)])
             .coalesce(1))  # v3 -> checkpoint at 3
    assert t.checkpoints() == [3]
    t.append(_df(spark, [(300 + i, f"d{i}") for i in range(6)])
             .coalesce(1))  # v4: chain delta past the anchor
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    v = fresh.compact(zorder_by=["k"], incremental=True, target_files=2)
    assert fresh._files_materialized == 0
    met = fresh._commit_record(v)["metrics"]
    assert met["incremental"] is True
    assert met["files_clustered"] == 3  # the three post-cluster appends
    full = t._manifest(v - 1)["files"]
    assert met["files_carried"] == len(full) - 3
    got = sorted(r["k"] for r in fresh.read().collect())
    assert got == sorted(
        list(range(20)) + [100 + i for i in range(6)]
        + [200 + i for i in range(6)] + [300 + i for i in range(6)]
    )


def test_compact_where_materializes_only_candidates(spark, tmp_path):
    """OPTIMIZE ... WHERE on a checkpoint-anchored table scopes the
    bin-pack through the predicate-pruned partial snapshot: only the
    hot region's candidate files ever become driver Python."""
    _checkpointed_four_ranges(spark, tmp_path)
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    # both the 100- and 200-range files are small; only they qualify
    v = fresh.compact(where="k >= 100 AND k <= 204")
    assert fresh._files_materialized == 2
    met = fresh._commit_record(v)["metrics"]
    assert met["files_compacted"] == 2
    got = sorted(r["k"] for r in fresh.read().collect())
    assert len(got) == 25


def test_epoch_map_survives_vacuum_via_checkpoint_txn(spark, tmp_path):
    """ADVICE r13: the (app_id, epoch) -> version idempotence map used
    to be rebuilt from raw commit records only, so vacuum dropping an
    old record forgot its epoch and a late-replayed batch double-
    landed. Checkpoints now persist the accumulated map in their txn
    footer (Delta's checkpoint txn actions) and fresh instances seed
    from it — exactly-once survives retention."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=2
    )
    t.overwrite(_df(spark, [(0, "base")]))                     # v0
    t.append(_df(spark, [(1, "a")]), epoch=1, app_id="w")      # v1
    t.append(_df(spark, [(2, "b")]), epoch=2, app_id="w")      # v2 cp
    t.append(_df(spark, [(3, "c")]), epoch=3)                  # v3 bare
    t.append(_df(spark, [(4, "d")]))                           # v4 cp
    t.append(_df(spark, [(5, "e")]))                           # v5
    dropped = t.vacuum(retain_last=1, data_grace_seconds=0.0)
    assert dropped["versions_dropped"]                         # records gone
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    head = fresh.latest_version()
    n = fresh.read().count()
    # replayed batches whose epochs live ONLY in vacuumed records are
    # still no-ops — namespaced and bare alike
    assert fresh.append(
        _df(spark, [(1, "a")]), epoch=1, app_id="w"
    ) in (1, head)
    assert fresh.latest_version() == head
    assert fresh.append(_df(spark, [(3, "c")]), epoch=3) in (3, head)
    assert fresh.latest_version() == head
    assert fresh.read().count() == n
    # a genuinely NEW epoch still lands
    v = fresh.append(_df(spark, [(6, "f")]), epoch=9, app_id="w")
    assert v == head + 1 and fresh.read().count() == n + 1


def test_changes_across_vacuum_gap_falls_back(spark, tmp_path):
    """Review r14: a tag-pinned old version survives vacuum while the
    untagged middle is dropped — the chain between the endpoints has a
    gap, but both endpoints stay resolvable via checkpoints. changes()
    must fall back to the two-manifest diff (as it always did), not
    raise; a genuinely vacuumed ENDPOINT still raises (the feed
    truncation signal)."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=2
    )
    t.overwrite(_df(spark, [(1, "a")]))               # v0
    t.append(_df(spark, [(2, "b")]).coalesce(1))      # v1
    t.tag("gold", 1)
    for i in range(3, 7):
        t.append(_df(spark, [(i, f"x{i}")]).coalesce(1))  # v2..v5
    dropped = t.vacuum(retain_last=2, data_grace_seconds=0.0)
    vs = t.versions()
    assert 1 in vs and dropped["versions_dropped"], (vs, dropped)
    assert vs != list(range(vs[0], vs[-1] + 1))  # a real gap
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    feed = fresh.changes(1, vs[-1])
    got = {(r["k"], r["_change_type"]) for r in feed.collect()}
    assert got == {(i, "insert") for i in range(3, 7)}
    # vacuumed endpoint still raises
    import pytest as _pytest

    gone = dropped["versions_dropped"][0]
    with _pytest.raises(VersionNotFoundError):
        fresh.changes(gone, vs[-1])


def test_changes_chain_path_gates_reader_features(spark, table):
    """Review r14: the chain fast path must enforce the same reader-
    feature gate the two-manifest path gets from _manifest — a commit
    in the polled range requiring an unknown reader feature fails
    loudly instead of computing a feed that ignores it."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        TableFeatureError,
    )

    v0 = table.overwrite(_df(spark, [(1, "a")]))
    v1 = _plant_future_record(table, reader=["v9-frobnicated-masks"])
    with pytest.raises(TableFeatureError, match="v9-frobnicated-masks"):
        table.changes(v0, v1).collect()


def test_incremental_zorder_carries_readded_files(spark, tmp_path):
    """Review r14: consolidate_dv / restore re-commit files by NAME
    (remove+add, the mask-reset mechanism) — their bytes and layout
    never changed, so an incremental ZORDER must keep carrying them in
    the clustered base (as the anchor-manifest diff did), not re-cluster
    the whole masked base."""
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    t.overwrite(_df(spark, [(i, f"a{i}") for i in range(20)]))
    t.compact(zorder_by=["k"], target_files=4)        # v1: full cluster
    t.delete("k = 2", mode="dv")                      # v2: mask
    t.delete("k = 11", mode="dv")                     # v3: mask
    t.consolidate_dv()                                # v4: remove+add
    t.append(_df(spark, [(100 + i, f"b{i}") for i in range(5)])
             .coalesce(1))                            # v5: real tail
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    v = fresh.compact(zorder_by=["k"], incremental=True, target_files=1)
    met = fresh._commit_record(v)["metrics"]
    assert met["incremental"] is True
    assert met["files_clustered"] == 1  # ONLY the appended tail file
    got = sorted(r["k"] for r in fresh.read().collect())
    assert got == sorted(
        [i for i in range(20) if i not in (2, 11)]
        + [100 + i for i in range(5)]
    )


def test_read_columns_resolve_case_insensitively(spark, tmp_path):
    """Review r14: read(columns=...) resolves names the way Spark and
    this engine's constraint binding do — case-insensitively, emitting
    the table's canonical names; unknown names still raise."""
    t = VersionedStageTable(spark, str(tmp_path / "vt"))
    t.overwrite(_df(spark, [(1, "a")]))
    out = t.read(columns=["K", "V"])
    assert out.columns == ["k", "v"]
    assert _rows(out) == [(1, "a")]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="nope"):
        t.read(columns=["nope"])


def test_seed_epochs_tolerates_corrupt_txn_footer(spark, tmp_path):
    """Review r14: a corrupt checkpoint txn footer must degrade (older
    checkpoint or full record walk), not poison every epoch probe."""
    import pyarrow.parquet as pq

    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=2
    )
    t.overwrite(_df(spark, [(0, "base")]))
    t.append(_df(spark, [(1, "a")]), epoch=1, app_id="w")
    t.append(_df(spark, [(2, "b")]), epoch=2, app_id="w")  # cp at 2
    cp = t._checkpoint_path(t.checkpoints()[-1])
    tbl = pq.read_table(cp)
    meta = dict(tbl.schema.metadata or {})
    meta[b"txn"] = b'[["w", 1, '  # truncated JSON
    pq.write_table(tbl.replace_schema_metadata(meta), cp)
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=1000
    )
    # the record walk still answers (records not vacuumed here)
    assert fresh.append(
        _df(spark, [(1, "a")]), epoch=1, app_id="w"
    ) == 1
    assert fresh.latest_version() == 2

"""Optimistic concurrency on the versioned table: automatic commit
rebase for compatible races, typed conflicts for real ones — Delta's
Serializable conflict matrix (reference stage zone
``light_transform.py:1363-1409`` writes Delta tables, whose writers get
this protocol from delta-spark; here it is native to the log).

Races are injected DETERMINISTICALLY: a wrapping LogStore runs an
interloper commit immediately before the victim's first commit-point
attempt, so the victim always loses the version race and must rebase
or raise."""

import os

import pytest
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.versioned import (
    ConcurrentAppendError,
    ConcurrentCommitError,
    ConcurrentDeleteDeleteError,
    ConcurrentDeleteReadError,
    MetadataChangedError,
    PosixLinkLogStore,
    VersionedStageTable,
)


class RaceOnceStore(PosixLinkLogStore):
    """Runs ``interloper()`` once, right before the first
    ``put_if_absent`` — the victim's prepared commit then collides
    with whatever the interloper committed."""

    def __init__(self, interloper):
        self.interloper = interloper
        self.fired = False

    def put_if_absent(self, target, content):
        if not self.fired:
            self.fired = True
            self.interloper()
        return super().put_if_absent(target, content)


class AlwaysLoseStore(PosixLinkLogStore):
    """Claims every version is taken — models a writer that never wins
    the race, to pin the rebase bound."""

    def __init__(self):
        self.attempts = 0

    def put_if_absent(self, target, content):
        self.attempts += 1
        return False


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "k int, v string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _pair(spark, tmp_path, interloper_fn):
    """(victim, other): two table instances on one path; the victim's
    store fires ``interloper_fn(other)`` at its first commit point."""
    path = str(tmp_path / "vt")
    other = VersionedStageTable(spark, path)
    victim = VersionedStageTable(
        spark, path, log_store=RaceOnceStore(lambda: interloper_fn(other))
    )
    return victim, other


def test_blind_appends_rebase(spark, tmp_path):
    victim, other = _pair(
        spark, tmp_path, lambda o: o.append(_df(spark, [(2, "win")]))
    )
    other.overwrite(_df(spark, [(1, "base")]))
    v = victim.append(_df(spark, [(3, "lose")]))
    # the interloper took version 1; the victim rebased onto 2
    assert v == 2
    assert _rows(victim.read()) == [(1, "base"), (2, "win"), (3, "lose")]
    assert [h["op"] for h in victim.history()] == [
        "overwrite", "append", "append",
    ]


def test_append_conflicts_with_constraint_change(spark, tmp_path):
    victim, other = _pair(
        spark, tmp_path, lambda o: o.add_constraint("pos", "k > 0")
    )
    other.overwrite(_df(spark, [(1, "base")]))
    # the victim's batch was never validated against the new constraint
    with pytest.raises(MetadataChangedError):
        victim.append(_df(spark, [(-5, "unchecked")]))


def test_append_conflicts_with_schema_change(spark, tmp_path):
    victim, other = _pair(
        spark,
        tmp_path,
        lambda o: o.append(
            spark.createDataFrame([(9, "s", 1.5)], "k int, v string, w double"),
            merge_schema=True,
        ),
    )
    other.overwrite(_df(spark, [(1, "base")]))
    with pytest.raises(MetadataChangedError):
        victim.append(_df(spark, [(3, "stale-schema")]))


def test_delete_rebases_over_disjoint_append(spark, tmp_path):
    victim, other = _pair(
        spark, tmp_path, lambda o: o.append(_df(spark, [(1000, "far")]))
    )
    other.overwrite(_df(spark, [(i, "x") for i in range(20)]))
    # the appended batch's stats (k = [1000, 1000]) PROVE no row matches
    v = victim.delete("k < 10")
    assert v == 2
    got = _rows(victim.read())
    assert (1000, "far") in got
    assert all(k >= 10 for k, _ in got)


def test_delete_conflicts_with_matching_append(spark, tmp_path):
    victim, other = _pair(
        spark, tmp_path, lambda o: o.append(_df(spark, [(5, "missed")]))
    )
    other.overwrite(_df(spark, [(i, "x") for i in range(20)]))
    # k=5 falls inside the delete predicate: rebasing would silently
    # leave a matching row behind
    with pytest.raises(ConcurrentAppendError):
        victim.delete("k < 10")


def test_delete_delete_conflict(spark, tmp_path):
    victim, other = _pair(spark, tmp_path, lambda o: o.delete("k < 5"))
    other.overwrite(_df(spark, [(i, "x") for i in range(20)]).coalesce(1))
    # both deletes rewrite the same (single) file
    with pytest.raises(ConcurrentDeleteDeleteError):
        victim.delete("k < 3")


def test_dv_delete_conflicts_with_concurrent_mask(spark, tmp_path):
    victim, other = _pair(
        spark, tmp_path, lambda o: o.delete("k < 5", mode="dv")
    )
    other.overwrite(_df(spark, [(i, "x") for i in range(20)]).coalesce(1))
    # the victim's positions were computed against the unmasked file
    with pytest.raises(ConcurrentDeleteReadError):
        victim.delete("k >= 15", mode="dv")


def test_compact_rebases_over_append(spark, tmp_path):
    victim, other = _pair(
        spark, tmp_path, lambda o: o.append(_df(spark, [(99, "late")]))
    )
    other.overwrite(_df(spark, [(1, "a"), (2, "b")]).repartition(2))
    v = victim.compact()
    assert v == 2
    assert _rows(victim.read()) == [(1, "a"), (2, "b"), (99, "late")]


def test_compact_conflicts_when_input_removed(spark, tmp_path):
    victim, other = _pair(spark, tmp_path, lambda o: o.delete("k = 1"))
    other.overwrite(_df(spark, [(1, "a"), (2, "b")]).repartition(2))
    # the COW delete removed the very file the compaction packed
    with pytest.raises(ConcurrentCommitError):
        victim.compact()


def test_merge_conflicts_on_any_concurrent_add(spark, tmp_path):
    victim, other = _pair(
        spark, tmp_path, lambda o: o.append(_df(spark, [(2, "raced")]))
    )
    other.overwrite(_df(spark, [(1, "a")]))
    # the appended file may hold a matched key the merge never saw
    with pytest.raises(ConcurrentAppendError):
        victim.merge(_df(spark, [(2, "B")]), ["k"])


def test_overwrite_conflicts_with_concurrent_append(spark, tmp_path):
    victim, other = _pair(
        spark, tmp_path, lambda o: o.append(_df(spark, [(7, "svc")]))
    )
    other.overwrite(_df(spark, [(1, "a")]))
    # replacing state that changed underneath is a lost update
    with pytest.raises(ConcurrentAppendError):
        victim.overwrite(_df(spark, [(9, "new")]))


def test_same_epoch_race_is_idempotent(spark, tmp_path):
    batch = [(3, "once")]
    victim, other = _pair(
        spark, tmp_path, lambda o: o.append(_df(spark, batch), epoch=7)
    )
    other.overwrite(_df(spark, [(1, "base")]))
    v = victim.append(_df(spark, batch), epoch=7)
    # the interloper landed THIS batch (same epoch): the victim adopts
    # its version instead of double-landing
    assert v == 1 == victim.latest_version()
    assert _rows(victim.read()) == [(1, "base"), (3, "once")]


def test_rebase_attempts_are_bounded(spark, tmp_path):
    path = str(tmp_path / "vt")
    VersionedStageTable(spark, path).overwrite(_df(spark, [(1, "a")]))
    store = AlwaysLoseStore()
    t = VersionedStageTable(spark, path, log_store=store)
    with pytest.raises(ConcurrentCommitError, match="gave up"):
        t.append(_df(spark, [(2, "b")]))
    assert store.attempts > 1  # it did retry before giving up


def test_rebased_append_survives_read_after_checkpoint(spark, tmp_path):
    # a rebase landing ON the checkpoint interval still checkpoints and
    # resolves correctly afterwards
    path = str(tmp_path / "vt")
    other = VersionedStageTable(spark, path, checkpoint_interval=2)
    victim = VersionedStageTable(
        spark,
        path,
        checkpoint_interval=2,
        log_store=RaceOnceStore(
            lambda: other.append(_df(spark, [(2, "win")]))
        ),
    )
    other.overwrite(_df(spark, [(1, "base")]))
    v = victim.append(_df(spark, [(3, "lose")]))  # rebases 1 -> 2
    assert v == 2 and v in victim.checkpoints()
    fresh = VersionedStageTable(spark, path, checkpoint_interval=2)
    assert _rows(fresh.read()) == [(1, "base"), (2, "win"), (3, "lose")]


def _unreferenced_parquet(table):
    referenced = set()
    for v in table.versions():
        m = table._manifest(v)
        referenced.update(m["files"])
        for lst in (m.get("dv") or {}).values():
            referenced.update(lst)
    out = []
    data = os.path.join(table.path, "data")
    for sub in os.listdir(data):
        for fn in os.listdir(os.path.join(data, sub)):
            rel = os.path.join("data", sub, fn)
            if fn.endswith(".parquet") and rel not in referenced:
                out.append(rel)
    return sorted(out)


def test_vacuum_reclaims_conflict_orphans_with_grace(spark, tmp_path):
    """A conflicted commit has already written its data files when it
    raises — they are orphans no manifest references. vacuum reclaims
    them, but only past data_grace_seconds: a fresh in-flight writer's
    files (indistinguishable from orphans) survive a concurrent
    vacuum."""
    victim, other = _pair(
        spark, tmp_path, lambda o: o.append(_df(spark, [(5, "missed")]))
    )
    other.overwrite(_df(spark, [(i, "x") for i in range(20)]))
    with pytest.raises(ConcurrentAppendError):
        victim.delete("k < 10")
    orphans = _unreferenced_parquet(other)
    assert orphans  # the refused delete's rewrite landed as files
    # a long grace treats them as possibly-in-flight: kept
    rep = other.vacuum(retain_last=100, data_grace_seconds=1e6)
    assert rep["files_deleted"] == 0
    assert _unreferenced_parquet(other) == orphans
    # zero grace reclaims them; every retained version stays readable
    n_before = other.read().count()
    rep = other.vacuum(retain_last=100, data_grace_seconds=0.0)
    assert rep["files_deleted"] == len(orphans)
    assert _unreferenced_parquet(other) == []
    assert other.read().count() == n_before

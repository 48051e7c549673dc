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


def test_concurrency_model_based_random_races(spark, tmp_path):
    """Model-based check under contention: a random op sequence where
    most commits LOSE the version race to an interloper blind append
    at the commit point. The pure-Python model applies the interloper
    first (it always wins), then the op — unless the op raised a typed
    conflict, in which case only the interloper's batch lands. After
    every step the latest version must read back exactly the model
    state; no rebase may lose, duplicate, or resurrect a row."""
    import random

    rng = random.Random(20260816)
    path = str(tmp_path / "vt")
    other = VersionedStageTable(spark, path)

    def _frame(d):
        return spark.createDataFrame(
            sorted(d.items()), "k int, v string"
        )

    state = {k: "base" for k in range(0, 40, 2)}
    other.overwrite(_frame(state))
    nxt = 1000  # interloper keys: disjoint from every predicate below
    for step in range(14):
        op = rng.choice(
            ["append", "delete", "delete_dv", "merge", "compact",
             "consolidate_dv"]
        )
        race = rng.random() < 0.7
        ibatch = {nxt: f"i{step}"}
        nxt += 1
        if race:
            store = RaceOnceStore(lambda b=ibatch: other.append(_frame(b)))
            t = VersionedStageTable(spark, path, log_store=store)
        else:
            store = None
            t = other
        applied = True
        pending = None  # model delta if the op commits
        try:
            if op == "append":
                batch = {50 + step: f"a{step}"}
                t.append(_frame(batch))
                pending = ("upsert", batch)
            elif op == "delete":
                cut = rng.randrange(40)
                t.delete(f"k < {cut}")
                pending = ("delete", lambda k: k < cut)
            elif op == "delete_dv":
                lo = rng.randrange(40)
                t.delete(f"k >= {lo} AND k < {lo + 6}", mode="dv")
                pending = ("delete", lambda k: lo <= k < lo + 6)
            elif op == "merge":
                src = {rng.randrange(45): f"m{step}"}
                t.merge(_frame(src), ["k"])
                pending = ("upsert", src)
            elif op == "compact":
                t.compact(max_file_bytes=1 << 30)
            else:
                t.consolidate_dv()
        except ConcurrentCommitError:
            applied = False
        # the interloper commits iff the victim actually reached its
        # commit point (a no-op delete/compact never races)
        if race and store.fired:
            state.update(ibatch)
        if applied and pending:
            kind, arg = pending
            if kind == "upsert":
                state.update(arg)
            else:
                state = {
                    k: v for k, v in state.items()
                    if not (k < 1000 and arg(k))
                }
        got = {r["k"]: r["v"] for r in other.read().collect()}
        assert got == state, (step, op, race, applied)
    # maintenance under the accumulated masks/rebases stays logically
    # invisible, and vacuum leaves the survivor exact
    other.consolidate_dv()
    other.vacuum(retain_last=1, data_grace_seconds=0.0)
    got = {r["k"]: r["v"] for r in other.read().collect()}
    assert got == state


def test_delete_keys_equals_predicate_delete(spark, tmp_path):
    """delete_keys(df) on an IN-expressible victim set must leave the
    table exactly where the equivalent predicate DELETE would — same
    survivors, same COW footprint discipline (untouched files carried
    by name), across several randomly drawn key sets."""
    import random

    rng = random.Random(20260817)
    for trial in range(3):
        rows = [(k, f"v{k % 7}") for k in rng.sample(range(200), 60)]
        ta = VersionedStageTable(spark, str(tmp_path / f"a{trial}"))
        tb = VersionedStageTable(spark, str(tmp_path / f"b{trial}"))
        df = _df(spark, rows).repartition(3)
        ta.overwrite(df)
        tb.overwrite(df)
        victims = sorted(rng.sample([k for k, _ in rows], 9)
                         + [5000 + trial])  # one never-present key
        ta.delete_keys(
            spark.createDataFrame([(k,) for k in victims], "k int"), ["k"]
        )
        tb.delete("k IN (%s)" % ", ".join(map(str, victims)))
        assert _rows(ta.read()) == _rows(tb.read()), trial
        # both rewrote the same files: carried-by-name sets agree
        fa = set(ta._manifest(0)["files"]) & set(
            ta._manifest(ta.latest_version())["files"]
        )
        fb = set(tb._manifest(0)["files"]) & set(
            tb._manifest(tb.latest_version())["files"]
        )
        assert len(fa) == len(fb), trial


def run_vocab_sequence(spark, path, seed, steps=16):
    """Randomized two-writer interleavings over the FULL op vocabulary
    — data ops (append / delete / delete_keys / merge), maintenance
    (bin-pack + zorder OPTIMIZE), epoch retries under MIXED writer
    identities (two app_ids plus the bare legacy namespace, with
    cross-identity same-epoch probes that must never alias), and ALL
    schema ops (rename_column / drop_column / re-add-after-drop /
    widen_column) — against a sequential pure-Python oracle. The interloper fires at
    the victim's commit point and always wins; the oracle therefore
    applies interloper-then-victim SEQUENTIALLY (victim skipped when it
    raised a typed conflict). After every step the table must read back
    exactly the oracle state under the oracle's current column names
    and types — no rebase may lose, duplicate, resurrect, mis-map, or
    mis-type a row. Module-level so ``tools/model_soak.py`` can drive
    many seeds; the in-suite test keeps a fixed few."""
    import random

    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        TableFeatureError,
    )

    # append keys are 100+step, readd_w keys 140+step, cross-identity
    # epoch landings 180+step; past 40 steps
    # the ranges collide and a plain append would duplicate a key the
    # oracle dict upserts — a false failure, not an engine bug
    assert steps <= 40, "key ranges collide past 40 steps"
    rng = random.Random(seed)
    other = VersionedStageTable(spark, path)

    vcol = ["v"]      # current logical name of the value column (model)
    has_w = [True]    # extra column w present in the logical schema?
    w_type = ["int"]  # current declared type of w: "int" -> "bigint"

    def _schema(col=None):
        s = f"k int, {col or vcol[0]} string"
        if has_w[0]:
            s += f", w {w_type[0]}"
        return s

    def _frame(d, col=None):
        # d: k -> v string; w (when present) is derived k*7 so the
        # oracle can recompute it without tracking a second dict
        rows = [
            ((k, v, k * 7) if has_w[0] else (k, v))
            for k, v in sorted(d.items())
        ]
        return spark.createDataFrame(rows, _schema(col))

    state = {k: "base" for k in range(0, 40, 2)}
    wnull: set = set()  # keys whose w is NULL (pre-re-add rows)
    other.overwrite(_frame(state))
    nxt = [1000]  # interloper keys: disjoint from victim predicates
    # per-IDENTITY epoch map — the oracle's twin of the engine's
    # (app_id, epoch) -> version txn discipline: None is the legacy
    # bare namespace, the two app_ids are independent writers
    APP_IDS = [None, "app-a", "app-b"]
    committed_epochs = {}  # (app_id, epoch) -> (batch, version)

    def _interlope(o, step):
        roll = rng.random()
        if roll < 0.55:
            b = {nxt[0]: f"i{step}"}
            nxt[0] += 1
            o.append(_frame(b))
            return ("upsert", b)
        if roll < 0.75:
            victims = [k for k in state if k < 1000]
            if not victims:
                return None
            k = rng.choice(victims)
            o.delete_keys(
                spark.createDataFrame([(k,)], "k int"), ["k"]
            )
            return ("delete", {k})
        new = f"v{step}"
        o.rename_column(vcol[0], new)
        return ("rename", new)

    for step in range(steps):
        op = rng.choice(
            ["append", "delete", "delete_keys", "merge", "compact",
             "zorder", "epoch_retry", "drop_w", "readd_w", "widen_w"]
        )
        race = rng.random() < 0.6
        idelta = [None]
        if race:
            def _fire(s=step):
                idelta[0] = _interlope(other, s)

            t = VersionedStageTable(
                spark, path, log_store=RaceOnceStore(_fire)
            )
        else:
            t = other
        applied = True
        pending = None
        col_at_start = vcol[0]
        try:
            if op == "append":
                batch = {100 + step: f"a{step}"}
                e = rng.choice([None, 10_000 + step])
                aid = rng.choice(APP_IDS) if e is not None else None
                v = t.append(
                    _frame(batch, col_at_start), epoch=e, app_id=aid
                )
                pending = ("upsert", batch)
                if e is not None:
                    committed_epochs[(aid, e)] = (batch, v)
            elif op == "delete":
                cut = rng.randrange(40)
                t.delete(f"k < {cut}")
                pending = ("delpred", cut)
            elif op == "delete_keys":
                ks = rng.sample(range(200), 4)
                t.delete_keys(
                    spark.createDataFrame([(k,) for k in ks], "k int"),
                    ["k"],
                )
                pending = ("delete", set(ks))
            elif op == "merge":
                src = {rng.randrange(45): f"m{step}"}
                t.merge(_frame(src, col_at_start), ["k"])
                pending = ("upsert", src)
            elif op == "compact":
                t.compact(max_file_bytes=1 << 30)
            elif op == "zorder":
                t.compact(zorder_by=["k"], target_files=2)
            elif op == "drop_w":
                if has_w[0]:
                    t.drop_column("w")
                    pending = ("drop_w", None)
                else:
                    applied = False
            elif op == "readd_w":
                if has_w[0]:
                    applied = False
                else:
                    # re-add AFTER drop: merge_schema append mints a
                    # fresh physical name — every pre-existing row must
                    # read w as NULL (dropped bytes never resurrect)
                    batch = {140 + step: f"w{step}"}
                    has_w[0] = True  # frame builder needs the column
                    w_type[0] = "int"
                    try:
                        t.append(
                            _frame(batch, col_at_start),
                            merge_schema=True,
                        )
                        pending = ("readd_w", batch)
                    except Exception:
                        has_w[0] = False
                        raise
            elif op == "widen_w":
                if has_w[0] and w_type[0] == "int":
                    t.widen_column("w", "bigint")
                    pending = ("widen_w", None)
                else:
                    applied = False
            else:  # epoch_retry: replay / cross-identity probe
                applied = False  # same-identity replay changes nothing
                if committed_epochs:
                    (aid, e), (batch, v0) = rng.choice(
                        sorted(
                            committed_epochs.items(),
                            key=lambda kv: (kv[0][0] or "", kv[0][1]),
                        )
                    )
                    if rng.random() < 0.5:
                        # same identity: the idempotence probe returns
                        # BEFORE any schema validation, so the replay
                        # frame's current shape is never inspected —
                        # exactly Delta txn semantics
                        v = t.append(
                            _frame(batch, col_at_start),
                            epoch=e, app_id=aid,
                        )
                        assert v == v0, (
                            "epoch replay must adopt the original"
                        )
                    else:
                        # CROSS identity, same epoch number: namespaces
                        # are disjoint, so the probe must NOT alias —
                        # either it adopts that identity's OWN prior
                        # commit, or it lands as a genuinely new one.
                        # The landed content is a FRESH key: re-landing
                        # the original batch would blind-append a
                        # duplicate row, which the keyed oracle dict
                        # cannot represent (and whose two copies can
                        # legitimately disagree on w-visibility across
                        # a drop/re-add — seed 46's lesson)
                        aid2 = rng.choice(
                            [a for a in APP_IDS if a != aid]
                        )
                        prior = committed_epochs.get((aid2, e))
                        if prior is not None:
                            v = t.append(
                                _frame(prior[0], col_at_start),
                                epoch=e, app_id=aid2,
                            )
                            assert v == prior[1], (
                                "must adopt own-namespace commit"
                            )
                        else:
                            batch2 = {180 + step: f"x{step}"}
                            v = t.append(
                                _frame(batch2, col_at_start),
                                epoch=e, app_id=aid2,
                            )
                            assert v != v0, (
                                "cross-identity epoch must not alias"
                            )
                            committed_epochs[(aid2, e)] = (batch2, v)
                            pending = ("upsert", batch2)
                            applied = True  # landed: oracle upserts
        except (ConcurrentCommitError, TableFeatureError, ValueError):
            applied = False
        # sequential oracle: interloper first (it won), then the victim
        if idelta[0] is not None:
            kind, arg = idelta[0]
            if kind == "upsert":
                state.update(arg)
                wnull.difference_update(arg)
            elif kind == "delete":
                for k in arg:
                    state.pop(k, None)
                    wnull.discard(k)
            else:
                vcol[0] = arg
        if applied and pending:
            kind, arg = pending
            if kind == "upsert":
                state.update(arg)
                wnull.difference_update(arg)
            elif kind == "delete":
                for k in arg:
                    state.pop(k, None)
                    wnull.discard(k)
            elif kind == "delpred":
                state = {
                    k: v for k, v in state.items()
                    if not (k < 1000 and k < arg)
                }
                wnull = {k for k in wnull if k in state}
            elif kind == "drop_w":
                has_w[0] = False
                wnull = set()
            elif kind == "readd_w":
                # committed inside the try: batch rows carry w, every
                # other surviving row reads NULL
                wnull = set(state)
                state.update(arg)
            elif kind == "widen_w":
                w_type[0] = "bigint"
        elif not applied and pending and pending[0] == "readd_w":
            has_w[0] = False  # the schema never evolved
        cur = other.read()
        want_cols = ["k", vcol[0]] + (["w"] if has_w[0] else [])
        assert cur.columns == want_cols, (step, op, cur.columns)
        if has_w[0]:
            want_t = "bigint" if w_type[0] == "bigint" else "int"
            assert dict(cur.dtypes)["w"] == want_t, (step, op)
            got = {
                r["k"]: (r[vcol[0]], r["w"]) for r in cur.collect()
            }
            want = {
                k: (v, None if k in wnull else k * 7)
                for k, v in state.items()
            }
        else:
            got = {r["k"]: r[vcol[0]] for r in cur.collect()}
            want = dict(state)
        assert got == want, (step, op, race, applied)
    # the survivor stays exact through maintenance + vacuum
    other.compact(max_file_bytes=1 << 30)
    other.vacuum(retain_last=1, data_grace_seconds=0.0)
    if has_w[0]:
        got = {r["k"]: (r[vcol[0]], r["w"]) for r in other.read().collect()}
        want = {
            k: (v, None if k in wnull else k * 7)
            for k, v in state.items()
        }
    else:
        got = {r["k"]: r[vcol[0]] for r in other.read().collect()}
        want = dict(state)
    assert got == want


@pytest.mark.parametrize("seed", [20260818, 13, 517])
def test_two_writer_random_vocabulary_against_sequential_oracle(
    spark, tmp_path, seed
):
    """Verdict r12 task #7: the two-writer generator draws the full op
    vocabulary INCLUDING every schema op (rename / drop / re-add-after-
    drop / widen) against the sequential-history oracle. Three pinned
    seeds here; ``tools/model_soak.py`` drives the same sequence over
    hundreds of seeds for round evidence."""
    run_vocab_sequence(spark, str(tmp_path / f"vt{seed}"), seed)

"""Checkpointed change-feed tail: a versioned table consumed as a
micro-batch stream (Delta readStream CDF analog), with exactly-once
replication into a second versioned table via batch epochs."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.versioned import (
    VersionedStageTable,
)
from cdk_datalake_ingest_upeu_spark.streaming.cdf_tail import (
    AmbiguousEpochError,
    FeedTruncatedError,
    VersionedChangeFeedReader,
    apply_cdf_batch,
)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "k int, v string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp_path):
    src = VersionedStageTable(spark, str(tmp_path / "src"))
    tgt = VersionedStageTable(spark, str(tmp_path / "tgt"))
    rdr = VersionedChangeFeedReader(src, str(tmp_path / "ckpt"))
    handler = lambda df, f, t: apply_cdf_batch(tgt, df, ["k"], epoch=t)
    return src, tgt, rdr, handler


def test_tail_replicates_source_through_all_op_kinds(spark, tmp_path):
    src, tgt, rdr, handler = _mk(spark, tmp_path)
    src.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    assert rdr.poll(handler)["delivered"]  # initial snapshot
    assert _rows(tgt.read()) == _rows(src.read())
    src.append(_df(spark, [(4, "d")]))
    src.merge(_df(spark, [(2, "B"), (5, "e")]), ["k"])
    rdr.drain(handler)
    assert _rows(tgt.read()) == _rows(src.read())
    src.delete("k <= 2")
    src.append(_df(spark, [(6, "f")]))
    rdr.drain(handler)
    assert _rows(tgt.read()) == _rows(src.read())
    # cursor is at the head; an idle poll delivers nothing
    assert rdr.poll(handler)["delivered"] is False


def test_failed_handler_redelivers_and_epoch_dedups(spark, tmp_path):
    src, tgt, rdr, handler = _mk(spark, tmp_path)
    src.overwrite(_df(spark, [(1, "a")]))
    rdr.poll(handler)
    src.append(_df(spark, [(2, "b")]))

    calls = {"n": 0}

    def flaky(df, f, t):
        apply_cdf_batch(tgt, df, ["k"], epoch=t)  # work LANDS ...
        calls["n"] += 1
        raise RuntimeError("crash before cursor advance")

    with pytest.raises(RuntimeError):
        rdr.poll(flaky)
    # cursor did NOT advance: a fresh reader re-delivers the range
    rdr2 = VersionedChangeFeedReader(src, str(tmp_path / "ckpt"))
    assert rdr2.last_consumed() == 0
    v_before = tgt.latest_version()
    rdr2.poll(handler)
    # the re-delivered batch's epoch was already committed: no-op
    assert tgt.latest_version() == v_before
    assert _rows(tgt.read()) == _rows(src.read())


def test_vacuumed_cursor_raises_truncation(spark, tmp_path):
    src, tgt, rdr, handler = _mk(spark, tmp_path)
    src.overwrite(_df(spark, [(1, "a")]))
    rdr.poll(handler)
    for i in range(4):
        src.append(_df(spark, [(10 + i, "x")]))
    src.vacuum(retain_last=1, data_grace_seconds=0.0)  # drops the consumer's cursor version
    with pytest.raises(FeedTruncatedError, match="retention"):
        rdr.poll(handler)


def test_two_independent_consumers(spark, tmp_path):
    src = VersionedStageTable(spark, str(tmp_path / "src"))
    src.overwrite(_df(spark, [(1, "a")]))
    seen_a, seen_b = [], []
    ra = VersionedChangeFeedReader(src, str(tmp_path / "ca"))
    rb = VersionedChangeFeedReader(src, str(tmp_path / "cb"))
    ra.poll(lambda df, f, t: seen_a.append((f, t, df.count())))
    src.append(_df(spark, [(2, "b")]))
    ra.poll(lambda df, f, t: seen_a.append((f, t, df.count())))
    # b starts late and catches up independently: snapshot then nothing
    rb.poll(lambda df, f, t: seen_b.append((f, t, df.count())))
    src.append(_df(spark, [(3, "c")]))
    rb.poll(lambda df, f, t: seen_b.append((f, t, df.count())))
    assert seen_a == [(0, 0, 1), (0, 1, 1)]
    assert seen_b == [(0, 0, 1), (0, 2, 2)]


def test_merge_epoch_replay_is_noop(spark, tmp_path):
    t = VersionedStageTable(spark, str(tmp_path / "vt"))
    t.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    v = t.merge(_df(spark, [(2, "B"), (3, "c")]), ["k"], epoch=9)
    files = t._manifest(v)["files"]
    v2 = t.merge(_df(spark, [(2, "B"), (3, "c")]), ["k"], epoch=9)
    assert v2 == v == t.latest_version()
    assert t._manifest(v)["files"] == files
    # genesis merge records its epoch too
    t2 = VersionedStageTable(spark, str(tmp_path / "vt2"))
    g = t2.merge(_df(spark, [(1, "a")]), ["k"], epoch=4)
    assert t2.merge(_df(spark, [(1, "a")]), ["k"], epoch=4) == g == 0


def test_poll_before_first_commit_is_idle(spark, tmp_path):
    """Consumer wired up before the producer's first commit: polls are
    idle, not errors; the seed arrives with the first commit."""
    src = VersionedStageTable(spark, str(tmp_path / "src"))
    rdr = VersionedChangeFeedReader(src, str(tmp_path / "ckpt"))
    seen = []
    assert rdr.poll(lambda df, f, t: seen.append(t))["delivered"] is False
    assert seen == [] and rdr.last_consumed() is None
    src.overwrite(_df(spark, [(1, "a")]))
    assert rdr.poll(lambda df, f, t: seen.append(df.count()))["delivered"]
    assert seen == [1]


def test_seed_ahead_of_producer_is_distinct_error(spark, tmp_path):
    """ADVICE r11 (low): a starting_version NEWER than the producer's
    head is not 'vacuumed past' — FeedTruncated's re-seed-and-reprocess
    remediation would be wrong. It raises SeedAheadError instead."""
    from cdk_datalake_ingest_upeu_spark.streaming.cdf_tail import (
        SeedAheadError,
    )

    src = VersionedStageTable(spark, str(tmp_path / "src"))
    src.overwrite(_df(spark, [(1, "a")]))
    rdr = VersionedChangeFeedReader(
        src, str(tmp_path / "ckpt"), starting_version=5
    )
    with pytest.raises(SeedAheadError, match="ahead"):
        rdr.poll(lambda df, f, t: None)
    # the producer catching up makes the same consumer healthy
    for i in range(5):
        src.append(_df(spark, [(10 + i, "x")]))
    out = rdr.poll(lambda df, f, t: None)
    assert out == {"from": 5, "to": 5, "delivered": True}


def test_apply_cdf_batch_delete_leg_replay_is_log_lookup(spark, tmp_path):
    """Verdict r11 task #5: the delete and merge legs of one CDF batch
    commit under DISTINCT sub-epochs (2e / 2e+1), so a crash between
    them makes the replayed delete leg a log lookup — zero new
    rewrites — while the merge leg still lands."""
    src, tgt, rdr, handler = _mk(spark, tmp_path)
    src.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    rdr.poll(handler)
    src.delete("k = 1")
    src.merge(_df(spark, [(2, "B"), (4, "d")]), ["k"])
    head = src.latest_version()

    # crash between the legs: deliver the batch, run ONLY the delete
    batch = src.changes(0, head)
    deletes = batch.filter(F.col("_change_type") == "delete").drop(
        "_change_type"
    )
    inserts = batch.filter(F.col("_change_type") == "insert").drop(
        "_change_type"
    )
    gone = deletes.select("k").exceptAll(inserts.select("k")).distinct()
    # the post-r13 applier commits its delete leg NAMESPACED; a bare
    # epoch here would now (correctly) trip the foreign-writer guard
    tgt.delete_keys(gone, ["k"], epoch=2 * head, app_id="cdf-apply")
    v_after_delete = tgt.latest_version()

    # re-delivery (cursor never advanced): the delete leg must NOT
    # re-execute — no new 'delete' commit appears; the merge lands once
    rdr.poll(handler)
    ops = [h["op"] for h in tgt.history()]
    assert ops.count("delete") == 1
    assert tgt.latest_version() == v_after_delete + 1
    assert _rows(tgt.read()) == _rows(src.read())
    # full-batch replay: one log lookup, nothing new
    v = apply_cdf_batch(tgt, batch, ["k"], epoch=head)
    assert v == tgt.latest_version()
    assert [h["op"] for h in tgt.history()] == ops


def test_retention_interleaving_property_never_skips(spark, tmp_path):
    """Verdict r11 task #9: random producer-append / producer-vacuum /
    consumer-poll interleavings (random retention, random idle spans).
    The consumer either drains EXACTLY-ONCE — delivered ranges are
    gapless and contiguous, and applying every batch reproduces the
    source snapshot at the consumed version — or raises
    FeedTruncatedError when vacuum outran its cursor. It must never
    silently skip a range."""
    import random

    rng = random.Random(20260819)
    src = VersionedStageTable(spark, str(tmp_path / "src"))
    rdr = VersionedChangeFeedReader(src, str(tmp_path / "ckpt"))
    src.overwrite(_df(spark, [(0, "seed")]))

    replica = {}  # k -> v, rebuilt from delivered change batches
    ranges = []   # delivered (from, to)

    def handler(df, f, t):
        for r in df.collect():
            if r["_change_type"] == "insert":
                replica[r["k"]] = r["v"]
            else:
                # delete of the exact pre-image row
                if replica.get(r["k"]) == r["v"]:
                    del replica[r["k"]]
        ranges.append((f, t))

    nxt = 1
    truncated = False
    for _ in range(60):
        roll = rng.random()
        try:
            if roll < 0.45:
                batch = {nxt + j: f"b{nxt}" for j in range(rng.randint(1, 3))}
                nxt += len(batch)
                if rng.random() < 0.3 and replica:
                    src.delete_keys(
                        spark.createDataFrame(
                            [(rng.choice(sorted(replica)),)], "k int"
                        ),
                        ["k"],
                    )
                src.append(_df(spark, sorted(batch.items())))
            elif roll < 0.65:
                src.vacuum(
                    retain_last=rng.randint(1, 4),
                    data_grace_seconds=0.0,
                )
            else:
                out = rdr.poll(handler)
                if out["delivered"]:
                    # exactly-once: no gap, no overlap with prior range
                    assert len(ranges) == 1 or (
                        ranges[-1][0] == ranges[-2][1]
                    ), ranges
                    # the replica equals the source AT the consumed
                    # version (modulo that version being retained)
                    got = {
                        r["k"]: r["v"]
                        for r in src.read(out["to"]).collect()
                    }
                    assert replica == got, (out, ranges)
        except FeedTruncatedError:
            truncated = True
            break
    if not truncated:
        # final drain must converge the replica onto the head
        try:
            rdr.drain(handler)
            head = src.latest_version()
            got = {r["k"]: r["v"] for r in src.read(head).collect()}
            assert replica == got
            assert ranges and ranges[-1][1] == head or not ranges
        except FeedTruncatedError:
            truncated = True
    # whichever path: the delivered ranges were contiguous throughout
    for a, b in zip(ranges, ranges[1:]):
        assert a[1] == b[0], ranges


def test_mixed_writer_epoch_namespaces_never_collide(spark, tmp_path):
    """The r12-verdict hazard, now structurally closed: a CDF applier's
    derived sub-epochs (2e / 2e+1 under its app_id) share a target with
    a second writer minting RAW epoch integers. Before txn app-id
    namespacing, the raw writer's epoch=2e+1 would match the applier's
    final-leg record and silently SKIP the raw batch; now each writer's
    counter lives in its own namespace and both land exactly once."""
    src = VersionedStageTable(spark, str(tmp_path / "src"))
    tgt = VersionedStageTable(spark, str(tmp_path / "tgt"))
    rdr = VersionedChangeFeedReader(src, str(tmp_path / "ckpt"))
    handler = lambda df, f, t: apply_cdf_batch(tgt, df, ["k"], epoch=t)
    src.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    rdr.drain(handler)  # applier lands snapshot under epoch 2*0+1 = 1
    assert tgt._manifest(tgt.latest_version())["epoch"] == 1
    assert tgt._manifest(tgt.latest_version())["app_id"] == "cdf-apply"
    # raw-epoch writer uses the SAME integer the applier just committed
    v_raw = tgt.append(_df(spark, [(10, "raw")]), epoch=1)
    assert v_raw == tgt.latest_version()
    assert tgt._manifest(v_raw)["epoch"] == 1
    assert "app_id" not in tgt._manifest(v_raw)
    assert _rows(tgt.read()) == [(1, "a"), (2, "b"), (10, "raw")]
    # each writer's REPLAY is still a no-op within its own namespace
    assert tgt.append(_df(spark, [(10, "raw")]), epoch=1) == v_raw
    head = tgt.latest_version()
    handler(
        src.read().withColumn("_change_type", F.lit("insert")), 0, 0
    )
    assert tgt.latest_version() == head  # applier replay: log lookup
    # and a SECOND applier identity gets its own namespace too
    v2 = apply_cdf_batch(
        tgt,
        _df(spark, [(20, "p2")]).withColumn("_change_type", F.lit("insert")),
        ["k"], epoch=0, app_id="pipeline-2",
    )
    assert v2 == tgt.latest_version() != head
    # namespaced records declare the writer feature; raw ones don't
    assert "txn-app-ids" in tgt.protocol()["writer"]


def test_mixed_writer_epoch_model_random_sequence(spark, tmp_path):
    """Model check over random MIXED-writer epoch draws: three writer
    identities (two app_ids + the anonymous raw space) interleave
    appends whose epoch integers deliberately overlap across writers,
    with replays drawn at random. Exactly-once per (writer, epoch):
    the table must hold one row per distinct (writer, epoch) pair and
    every replay must return the original version."""
    import random

    rng = random.Random(20260816)
    t = VersionedStageTable(spark, str(tmp_path / "vt"),
                            checkpoint_interval=4)
    t.overwrite(_df(spark, [(0, "seed")]))
    writers = [None, "app-a", "app-b"]
    landed: dict[tuple, int] = {}  # (app_id, epoch) -> version
    for step in range(24):
        w = rng.choice(writers)
        # small epoch range FORCES cross-writer integer collisions
        e = rng.randrange(5)
        batch = _df(spark, [(1000 + step, f"{w}:{e}")])
        if w is None:
            v = t.append(batch, epoch=e)
        else:
            v = t.append(batch, epoch=e, app_id=w)
        if (w, e) in landed:
            assert v == landed[(w, e)], (step, w, e)
        else:
            assert v == t.latest_version(), (step, w, e)
            landed[(w, e)] = v
    # one committed row per distinct (writer, epoch) pair, none skipped
    vals = sorted(
        r["v"] for r in t.read().collect() if r["k"] >= 1000
    )
    assert vals == sorted(f"{w}:{e}" for (w, e) in landed)
    # a FRESH instance (cold epoch map) replays every pair as a no-op
    t2 = VersionedStageTable(spark, str(tmp_path / "vt"))
    head = t2.latest_version()
    for (w, e), v in landed.items():
        b = _df(spark, [(9999, "replay")])
        got = t2.append(b, epoch=e) if w is None else t2.append(
            b, epoch=e, app_id=w
        )
        assert got == v
    assert t2.latest_version() == head


def test_namespaced_epoch_uses_separate_record_action(spark, tmp_path):
    """The review-found aliasing hazard: a namespaced epoch stored in
    the shared \"epoch\" field would satisfy a LEGACY writer's bare
    probe (which runs before any feature gate) and silently skip its
    batch. Namespaced commits therefore carry a separate app_epoch
    action and NO \"epoch\" key — a legacy probe structurally cannot
    see them."""
    t = VersionedStageTable(spark, str(tmp_path / "vt"))
    t.overwrite(_df(spark, [(0, "seed")]))
    v = t.append(_df(spark, [(1, "a")]), epoch=5, app_id="writer-a")
    rec = t._commit_record(v)
    assert "epoch" not in rec
    assert rec["app_epoch"] == {"app_id": "writer-a", "epoch": 5}
    # a bare-epoch probe on a FRESH instance misses it...
    t2 = VersionedStageTable(spark, str(tmp_path / "vt"))
    assert t2._epoch_version(5) is None
    # ...and the snapshot still surfaces both for observability
    m = t._manifest(v)
    assert m["epoch"] == 5 and m["app_id"] == "writer-a"
    # anonymous commits keep the legacy layout byte-for-byte
    v2 = t.append(_df(spark, [(2, "b")]), epoch=6)
    rec2 = t._commit_record(v2)
    assert rec2["epoch"] == 6 and "app_epoch" not in rec2


def test_apply_cdf_batch_upgrade_probes_legacy_epoch_space(
    spark, tmp_path
):
    """A batch landed by the PRE-namespacing applier recorded bare
    sub-epochs; a post-upgrade replay of the same batch must adopt that
    commit (exactly-once across the upgrade), not re-land it."""
    tgt = VersionedStageTable(spark, str(tmp_path / "tgt"))
    tgt.overwrite(_df(spark, [(1, "a")]))
    batch = _df(spark, [(2, "b")]).withColumn(
        "_change_type", F.lit("insert")
    )
    # legacy applier: final leg landed under BARE epoch 2*epoch+1
    v_legacy = tgt.merge(
        _df(spark, [(2, "b")]), ["k"], epoch=2 * 7 + 1
    )
    head = tgt.latest_version()
    assert apply_cdf_batch(tgt, batch, ["k"], epoch=7) == v_legacy
    assert tgt.latest_version() == head  # nothing re-landed


def test_default_applier_refuses_foreign_bare_epoch(spark, tmp_path):
    """The r13 residual: a target mixing the DEFAULT applier with a
    raw-epoch writer. A bare epoch minted AFTER the applier's first
    namespaced commit cannot be pre-upgrade residue — the engine must
    REFUSE (AmbiguousEpochError) rather than silently skip the live
    batch the probe would have aliased."""
    tgt = VersionedStageTable(spark, str(tmp_path / "tgt"))
    tgt.overwrite(_df(spark, [(1, "a")]))
    # post-upgrade default applier lands batch 3 (namespaced commits)
    b3 = _df(spark, [(2, "b")]).withColumn(
        "_change_type", F.lit("insert")
    )
    apply_cdf_batch(tgt, b3, ["k"], epoch=3)
    # a second, raw-epoch writer mints a bare epoch that collides with
    # batch 9's final sub-epoch (2*9+1)
    tgt.append(_df(spark, [(50, "raw")]), epoch=2 * 9 + 1)
    b9 = _df(spark, [(7, "g")]).withColumn(
        "_change_type", F.lit("insert")
    )
    with pytest.raises(AmbiguousEpochError, match="raw-epoch writer"):
        apply_cdf_batch(tgt, b9, ["k"], epoch=9)
    # the batch did NOT silently vanish: an explicit app_id lands it
    v = apply_cdf_batch(tgt, b9, ["k"], epoch=9, app_id="pipeline-b")
    assert v == tgt.latest_version()
    assert (7, "g") in _rows(tgt.read())
    # pre-upgrade residue (bare epoch OLDER than the first namespaced
    # commit) still aliases — upgrade continuity intact: epoch 0's
    # final sub-epoch (1) maps to the overwrite-era merge below
    tgt2 = VersionedStageTable(spark, str(tmp_path / "tgt2"))
    tgt2.overwrite(_df(spark, [(1, "a")]))
    v_legacy = tgt2.merge(_df(spark, [(2, "b")]), ["k"], epoch=1)
    apply_cdf_batch(
        tgt2,
        _df(spark, [(9, "z")]).withColumn(
            "_change_type", F.lit("insert")
        ),
        ["k"],
        epoch=4,
    )  # first namespaced commit AFTER the bare one
    b0 = _df(spark, [(2, "b")]).withColumn(
        "_change_type", F.lit("insert")
    )
    head = tgt2.latest_version()
    assert apply_cdf_batch(tgt2, b0, ["k"], epoch=0) == v_legacy
    assert tgt2.latest_version() == head


def test_delete_leg_upgrade_replay_skips_extra_commit(spark, tmp_path):
    """ADVICE r13: a pre-upgrade run that crashed BETWEEN the delete
    leg and the final leg recorded the delete as a BARE sub-epoch. The
    post-upgrade replay must mirror the final-leg probe on the delete
    leg: no re-executed delete, no extra commit, no orphaned legacy
    record — the replay lands exactly ONE commit (the merge leg)."""
    tgt = VersionedStageTable(spark, str(tmp_path / "tgt"))
    tgt.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    # pre-upgrade applier executed the delete leg (bare epoch 2*5=10),
    # then crashed before the final leg
    tgt.delete_keys(
        spark.createDataFrame([(2,)], "k int"), ["k"], epoch=10
    )
    head = tgt.latest_version()
    batch = (
        _df(spark, [(2, "gone")])
        .withColumn("_change_type", F.lit("delete"))
        .unionByName(
            _df(spark, [(4, "d")]).withColumn(
                "_change_type", F.lit("insert")
            )
        )
    )
    v = apply_cdf_batch(tgt, batch, ["k"], epoch=5)
    # exactly one new commit: the merge leg; the delete leg was a log
    # lookup against the legacy bare sub-epoch
    assert v == head + 1 and tgt.latest_version() == head + 1
    assert _rows(tgt.read()) == [(1, "a"), (3, "c"), (4, "d")]
    # replaying the whole batch again is a pure log lookup (no commit)
    assert apply_cdf_batch(tgt, batch, ["k"], epoch=5) == v
    assert tgt.latest_version() == head + 1


def test_delete_leg_probe_ignores_foreign_bare_append(spark, tmp_path):
    """Review r14: a raw-epoch writer's bare APPEND that collides with
    a delete sub-epoch (2e), minted before the applier ever ran, must
    not make the applier skip a live delete leg — the probe requires
    the hit's op to be 'delete' (the only op the pre-upgrade applier's
    delete leg could have committed)."""
    tgt = VersionedStageTable(spark, str(tmp_path / "tgt"))
    tgt.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    # foreign raw-epoch writer: bare epoch 10 == 2*5, op='append'
    tgt.append(_df(spark, [(50, "raw")]), epoch=10)
    batch = (
        _df(spark, [(2, "gone")])
        .withColumn("_change_type", F.lit("delete"))
        .unionByName(
            _df(spark, [(4, "d")]).withColumn(
                "_change_type", F.lit("insert")
            )
        )
    )
    apply_cdf_batch(tgt, batch, ["k"], epoch=5)
    rows = _rows(tgt.read())
    assert (2, "b") not in rows  # the delete leg EXECUTED
    assert (4, "d") in rows and (50, "raw") in rows


def test_apply_cdf_batch_gone_set_respects_multiplicity(spark, tmp_path):
    """r15 pin for the fused gone-set computation: the one-pass per-key
    count rewrite (gone iff delete multiplicity EXCEEDS insert
    multiplicity) must reproduce the old exceptAll-then-distinct
    semantics exactly, including the re-insert interplay: deletes apply
    FIRST, then every insert row merges — so any key carrying an insert
    in the range survives, a key with only deletes vanishes, and
    duplicate delete rows for one key still land as ONE keyed delete."""
    tgt = VersionedStageTable(spark, str(tmp_path / "tgt"))
    tgt.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c"), (5, "e")]))
    feed = spark.createDataFrame(
        [
            # key 1: delete then re-insert (update) -> stays, new value
            (1, "a", "delete"),
            (1, "A", "insert"),
            # key 2: insert + 2x delete -> in the gone set (del > ins),
            # but the merge leg re-lands its insert row: final state B
            (2, "B", "insert"),
            (2, "B", "delete"),
            (2, "b", "delete"),
            # key 5: two redundant delete rows, no insert -> gone
            (5, "e", "delete"),
            (5, "e", "delete"),
            # key 3: untouched by the feed -> stays as-is
            # key 4: plain new insert
            (4, "d", "insert"),
        ],
        "k int, v string, _change_type string",
    )
    apply_cdf_batch(tgt, feed, ["k"], epoch=7)
    assert _rows(tgt.read()) == [(1, "A"), (2, "B"), (3, "c"), (4, "d")]
    # replay of the same epoch is a no-op (exactly-once probe intact)
    v = tgt.latest_version()
    apply_cdf_batch(tgt, feed, ["k"], epoch=7)
    assert tgt.latest_version() == v

"""Tail a :class:`VersionedStageTable`'s change feed as a micro-batch
stream — Delta's ``spark.readStream.option("readChangeFeed", ...)``
consumed through the same foreachBatch shape every other streaming
operator here uses (reference consumers would tail Delta CDF from the
stage tables ``light_transform.py:1363-1409`` writes).

The reader keeps a DURABLE cursor (one JSON file, atomically replaced):
``poll(handler)`` hands the handler the row-level changes between the
cursor and the table's latest version and advances the cursor ONLY
after the handler returns — a crash or handler failure re-delivers the
same range on the next poll (at-least-once). The batch's
``to_version`` doubles as the downstream epoch id: a handler that
lands its output with ``VersionedStageTable.append(epoch=to_version)``
(or any idempotent sink keyed on it) gets exactly-once end-to-end,
the same txn-version composition Delta documents for
stream-into-table pipelines.

Scale shape: each poll reads only the symmetric-difference files of
the cursor and head manifests (an append-heavy producer's feed costs
the appended batches, never the table), and the cursor hop is one
atomic rename. Vacuuming the producer past an idle consumer's cursor
surfaces as :class:`FeedTruncatedError` — the consumer must re-seed —
exactly Delta's out-of-retention streaming error."""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.versioned import (
    VersionedStageTable,
    VersionNotFoundError,
)


class FeedTruncatedError(RuntimeError):
    """The producer vacuumed past this consumer's cursor: the versions
    needed to resume were dropped (Delta's out-of-retention stream
    failure). Re-seed the consumer — reprocess from a fresh snapshot."""


class AmbiguousEpochError(RuntimeError):
    """The DEFAULT applier identity's legacy bare-epoch probe hit a
    commit that CANNOT be pre-upgrade applier residue: the bare epoch
    was minted at a version NEWER than this applier's earliest
    namespaced commit, so it must belong to some other raw-epoch
    writer sharing the target. Treating it as "already landed" would
    silently skip a live batch (the pre-r13 aliasing hazard); treating
    it as absent could double-land a genuinely replayed one. The engine
    refuses instead — pass an explicit ``app_id`` to
    :func:`apply_cdf_batch` so the two writers' epoch counters live in
    disjoint namespaces."""


class SeedAheadError(ValueError):
    """``starting_version`` is newer than the producer's latest commit
    — an operator typo, or a consumer wired ahead of its producer.
    Distinct from :class:`FeedTruncatedError` on purpose: that error's
    re-seed-and-reprocess remediation would be WRONG here (nothing was
    vacuumed; the version simply is not committed yet). Wait for the
    producer, or seed from a live version."""


class VersionedChangeFeedReader:
    """Checkpointed micro-batch consumer of one table's change feed.

    ``starting_version`` (default 0) seeds the stream: the FIRST poll
    delivers that version's full snapshot as ``insert`` rows (Delta's
    ``startingVersion`` initial-snapshot semantics), subsequent polls
    deliver row-level diffs. Multiple independent consumers are just
    multiple checkpoint directories."""

    def __init__(
        self,
        table: VersionedStageTable,
        checkpoint_dir: str,
        *,
        starting_version: int = 0,
    ):
        self.table = table
        self.checkpoint_dir = os.fspath(checkpoint_dir)
        self.starting_version = starting_version
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self._cursor_path = os.path.join(self.checkpoint_dir, "cursor.json")

    def last_consumed(self) -> int | None:
        """Version the last successful poll consumed up to, or None
        before the first poll."""
        if not os.path.exists(self._cursor_path):
            return None
        with open(self._cursor_path, encoding="utf-8") as fh:
            return int(json.load(fh)["consumed"])

    def _advance(self, version: int) -> None:
        # same crash-safe shape as the table's own commit point: temp
        # write then atomic replace — a half-written cursor is unreadable
        # by NAME, never by content
        tmp = os.path.join(
            self.checkpoint_dir, f".cursor-{uuid.uuid4().hex[:8]}.tmp"
        )
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"consumed": int(version)}, fh)
        os.replace(tmp, self._cursor_path)

    def poll(self, handler) -> dict:
        """Deliver one micro-batch: ``handler(df, from_version,
        to_version)`` gets the changes since the cursor (``df`` carries
        ``_change_type``); the cursor advances only after the handler
        returns. Returns ``{"from": ..., "to": ..., "delivered": bool}``
        (``delivered=False`` when the feed is already drained —
        idle-poll, no handler call, no cursor write). A producer with
        ZERO commits yet (consumer wired up first — the normal
        deployment order) is an idle poll too, not an error."""
        cur = self.last_consumed()
        if not self.table.versions():
            at = cur if cur is not None else -1
            return {"from": at, "to": at, "delivered": False}
        head = self.table.latest_version()
        if cur is None:
            # initial snapshot: the seed version's full content as
            # inserts (an empty table seeds to an empty batch)
            seed = self.starting_version
            if seed > head:
                # not-yet-committed is NOT vacuumed-past: raising
                # FeedTruncated here would tell the operator to re-seed
                # and reprocess when the right move is to wait
                raise SeedAheadError(
                    f"{self.table.path}: starting version {seed} is "
                    f"ahead of the producer's latest commit {head}; "
                    f"nothing was vacuumed — wait for the producer or "
                    f"seed from a live version"
                )
            try:
                df = self.table.read(seed).withColumn(
                    "_change_type", F.lit("insert")
                )
            except VersionNotFoundError as exc:
                raise FeedTruncatedError(
                    f"{self.table.path}: starting version {seed} was "
                    f"vacuumed before this consumer first polled; "
                    f"re-seed from a live version"
                ) from exc
            handler(df, seed, seed)
            self._advance(seed)
            return {"from": seed, "to": seed, "delivered": True}
        if head <= cur:
            return {"from": cur, "to": cur, "delivered": False}
        try:
            df = self.table.changes(cur, head)
        except VersionNotFoundError as exc:
            raise FeedTruncatedError(
                f"{self.table.path}: cursor {cur} was vacuumed past "
                f"(latest {head}); this consumer fell out of the "
                f"producer's retention — re-seed and reprocess"
            ) from exc
        handler(df, cur, head)
        self._advance(head)
        return {"from": cur, "to": head, "delivered": True}

    def drain(self, handler, *, max_polls: int = 1_000_000) -> int:
        """Poll until the feed is empty; returns delivered batches."""
        n = 0
        for _ in range(max_polls):
            if not self.poll(handler)["delivered"]:
                return n
            n += 1
        return n


def _legacy_epoch_hit(
    target: VersionedStageTable,
    bare_epoch: int,
    require_op: str | None = None,
) -> int | None:
    """Probe the legacy (anonymous) epoch space for the DEFAULT applier
    identity, with the aliasing guard: a bare hit is accepted as
    pre-upgrade applier residue ONLY when it predates the applier's
    earliest NAMESPACED commit — the post-upgrade applier always
    namespaces, so a bare epoch minted after that point must be a
    foreign raw-epoch writer's, and silently treating it as "this batch
    already landed" would drop the batch. Raises
    :class:`AmbiguousEpochError` for that mix; the remedy is an
    explicit ``app_id``.

    ``require_op`` narrows the probe to hits whose commit record
    carries that op — the DELETE-leg probe passes ``"delete"``, so a
    foreign bare-epoch APPEND that happens to collide with a delete
    sub-epoch is treated as absent (the leg then executes — at worst
    the pre-probe behavior of one redundant-but-idempotent commit,
    never a silently skipped live delete)."""
    v = target._epoch_version(bare_epoch)
    if v is None:
        return None
    if require_op is not None:
        try:
            rec_op = target._commit_record(v).get("op")
        except Exception:
            rec_op = None  # record vacuumed: cannot attest, be safe
        if rec_op != require_op:
            return None
    # _epoch_version just refreshed the incremental (app_id, epoch) ->
    # version scan, so the map is complete up to the head
    first_namespaced = min(
        (
            ver
            for (a, _e), ver in target._epoch_versions.items()
            if a == "cdf-apply"
        ),
        default=None,
    )
    if first_namespaced is not None and v > first_namespaced:
        raise AmbiguousEpochError(
            f"{target.path}: bare epoch {bare_epoch} was committed at "
            f"version {v}, AFTER this applier's first namespaced commit "
            f"(version {first_namespaced}) — it belongs to another "
            f"raw-epoch writer, not to a pre-upgrade replay. Refusing "
            f"to alias it: pass an explicit app_id to apply_cdf_batch "
            f"so the two writers' epoch namespaces are disjoint"
        )
    return v


def apply_cdf_batch(target: VersionedStageTable, df: DataFrame,
                    key_columns: list[str], epoch: int,
                    app_id: str = "cdf-apply") -> int:
    """Reference handler: land one CDF batch into ANOTHER versioned
    table exactly-once. Deletes apply first (keys whose final state in
    the batch is a delete), inserts land as a latest-wins merge; the
    batch's ``to_version`` is the commit epoch, so a re-delivered batch
    (crash between handler and cursor advance) is a no-op.

    One batch may land as TWO commits (the keyed delete, then the
    merge), and one epoch id can only make ONE commit idempotent — so
    each leg gets its own SUB-EPOCH derived from the batch epoch:
    ``2*epoch`` for the delete, ``2*epoch + 1`` for the merge/append.
    A crash between the legs re-delivers the batch; the delete leg's
    replay is then a LOG LOOKUP (its sub-epoch is already committed),
    not a re-executed pruned scan — and the whole-batch fast path keys
    on the FINAL leg's sub-epoch, which exists iff the batch fully
    landed. The even/odd split keeps sub-epochs collision-free across
    batches, and ``app_id`` keeps them collision-free across WRITERS:
    every leg commits under this applier's own txn namespace (Delta's
    txn ``{appId, version}``), so a second writer minting raw epochs
    into the same target lives in a disjoint epoch space and neither
    can satisfy — or skip — the other's idempotence probe. Two
    DISTINCT CDF pipelines feeding one target must pass distinct
    app_ids (one writer identity, one epoch counter). The DEFAULT
    identity additionally probes the legacy bare-epoch space for
    upgrade continuity (pre-namespacing batches replay exactly-once,
    on BOTH legs — a pre-upgrade run that crashed between the delete
    and final legs replays without re-executing or re-committing the
    delete), GUARDED against the old aliasing hazard: a bare-epoch hit
    minted after this applier's first namespaced commit cannot be
    pre-upgrade residue and raises :class:`AmbiguousEpochError` rather
    than silently skipping the batch — mixing the default applier with
    a raw-epoch writer requires an explicit app_id."""
    delete_epoch, final_epoch = 2 * epoch, 2 * epoch + 1
    if target.versions():
        v = target._epoch_version(final_epoch, app_id)
        if v is None and app_id == "cdf-apply":
            # upgrade continuity, DEFAULT identity only: batches landed
            # by the pre-namespacing applier recorded bare sub-epochs,
            # and that applier could only have been the default
            # identity (app_id did not exist). Probing the legacy space
            # keeps a replay spanning the upgrade exactly-once; the
            # guard inside refuses bare epochs that postdate this
            # applier's own namespaced history. An EXPLICIT app_id is a
            # new-style multi-pipeline setup and never probes at all.
            v = _legacy_epoch_hit(target, final_epoch)
        if v is not None:
            return v
    pdf = df.persist()
    key_stats = None
    try:
        inserts = pdf.filter(F.col("_change_type") == "insert").drop(
            "_change_type"
        )
        if not target.versions():
            return target.append(inserts, epoch=final_epoch, app_id=app_id)
        # keys deleted and NOT re-inserted in the same range vanish —
        # applied as ONE keyed anti-delete (one pruned rewrite, one
        # commit), never a per-key DELETE loop. The old shape probed
        # gone.isEmpty() (an exceptAll scan) and inserts.isEmpty() as
        # two serial jobs; per-key insert/delete counts give both
        # answers AND the gone set in one aggregation pass (r15, guide
        # §1.2): exceptAll-then-distinct on the key projection is
        # exactly "keys whose delete multiplicity exceeds their insert
        # multiplicity".
        key_stats = pdf.groupBy(*key_columns).agg(
            F.count(F.when(F.col("_change_type") == "insert", 1)).alias(
                "__ins"
            ),
            F.count(F.when(F.col("_change_type") == "delete", 1)).alias(
                "__del"
            ),
        ).persist()
        tot = key_stats.agg(
            F.sum("__ins").alias("i"),
            F.count(F.when(F.col("__del") > F.col("__ins"), 1)).alias("g"),
        ).first()
        has_inserts = (tot["i"] or 0) > 0
        gone = key_stats.filter(F.col("__del") > F.col("__ins")).select(
            *key_columns
        )
        if tot["g"] > 0:
            # delete-leg upgrade continuity (mirror of the final-leg
            # probe): a pre-upgrade run that crashed BETWEEN the legs
            # recorded the delete leg as a bare sub-epoch; re-executing
            # it under the new namespace would be semantically
            # idempotent but would land an extra commit and orphan the
            # legacy record — skip the leg instead (same guard applies)
            legacy_delete_v = (
                _legacy_epoch_hit(
                    target, delete_epoch, require_op="delete"
                )
                if app_id == "cdf-apply"
                else None
            )
            if legacy_delete_v is None:
                target.delete_keys(
                    gone, key_columns, epoch=delete_epoch, app_id=app_id
                )
        if not has_inserts:
            # nothing to merge: land the epoch as a zero-row append so
            # a re-delivery is still a no-op
            return target.append(inserts, epoch=final_epoch, app_id=app_id)
        return target.merge(
            inserts, key_columns, epoch=final_epoch, app_id=app_id
        )
    finally:
        if key_stats is not None:
            key_stats.unpersist()
        pdf.unpersist()

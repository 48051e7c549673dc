"""Versioned stage table — a minimal Delta-transaction-log analog on
parquet.

The reference stages everything into Delta tables
(``light_transform.py:1363-1409``) and thereby gets Delta's transaction
log for free: time-travel reads, MERGE that rewrites only touched
files, and VACUUM that drops unreferenced files after a retention
window. ``delta-spark`` is image-blocked in this environment
(README's Delta note), so this module re-implements the *log protocol*
itself — the part of Delta that is pure bookkeeping — while the data
files stay plain parquet:

- ``<path>/_log/<version 8-digit>.json`` — one DELTA-ENCODED commit
  record per version: the files the commit ``add``s and ``remove``s
  (relative paths), the operation name, the schema as JSON, and
  per-file stats for the ADDED files only. A record's size is
  O(files changed by the commit), never O(table) — exactly Delta's
  add/remove-action log, and the reason a 10^6-file, 10^4-commit
  table stays appendable: an append to a million-file table writes a
  one-file record. The record's atomic create-if-absent (the
  :class:`PosixLinkLogStore` commit point) is Delta's
  optimistic-concurrency protocol: a racing writer that loses version
  N gets :class:`ConcurrentCommitError` and retries on N+1.
- ``<path>/_log/<version 8-digit>.checkpoint.parquet`` — every
  ``checkpoint_interval`` commits (and at :meth:`vacuum` boundaries) a
  full resolved snapshot (file list + accumulated stats + deletion
  vectors as COLUMNS, table schema/constraints as parquet key-value
  footer metadata) is checkpointed — Delta's parquet checkpoint, not
  an analog: columnar, so a reader that needs only the file list
  prunes the stats/dv columns, and splittable, so a 10^6-file
  checkpoint is not one monolithic JSON parse on the driver. Snapshot
  resolution reads ONE checkpoint plus at most ``checkpoint_interval``
  delta records, never the whole log, and resolved snapshots are
  memoized per table instance (versions are immutable, so the cache
  needs no invalidation except vacuum). Checkpoints are derived data —
  a crash between commit and checkpoint loses nothing (the next
  resolution anchors one checkpoint earlier), and a checkpoint-write
  failure never fails the already-durable commit. Legacy
  ``.checkpoint.json`` files remain readable.
- ``<path>/data/c<version>-<uuid>/part-*.parquet`` — each commit's new
  files land in a fresh subdirectory, so file names never collide and
  no commit ever mutates another commit's files. Old files are left in
  place until :meth:`vacuum` — which is what makes old versions
  readable.
- deletion vectors (``delete(mode='dv')``): a record's ``dv`` field
  maps data files to SIDECAR parquet files of RUN-LENGTH-ENCODED
  masked positions — (file_name, start, n) runs, roaring-bitmap-style
  compression, so a contiguous takedown's sidecar is bytes, not rows —
  merge-on-read DELETE with zero data rewrite; reads decode the runs
  and apply the mask as one anti-join and :meth:`compact` purges it.
  See the "deletion vectors" section below.

Scale shape: a commit's cost is the data it writes, never the table
size — ``append`` writes only the batch; ``merge`` and ``delete`` are
copy-on-write at FILE granularity, and their candidate files come
FIRST from per-file [min, max] column stats stored in the manifest
(collected at commit time, one batch-scale scan; the same discipline
as ``StageTable.lookup`` — ``sources/file_index.py``): pruning is a
zero-IO manifest walk, only surviving candidates pay the projected
scan, and only files that truly contain a match are rewritten. The
pruning decision per commit is recorded as manifest ``metrics``
(Delta's operationMetrics analog). Commit records are O(changed
files); the periodic checkpoint is the only O(table-files) artifact,
and a 100 TB table is ~10^5 files of 1 GB — a 10 MB checkpoint at
worst, the same envelope Delta's parquet checkpoints carry, paid once
per ``checkpoint_interval`` commits instead of on every commit and
every read.

The commit point itself is seamed out as a log store
(:class:`PosixLinkLogStore`): atomic create-if-absent via ``os.link``
on POSIX. On an object store the same seam maps to a conditional PUT
(S3 ``If-None-Match: *``, GCS ``ifGenerationMatch=0``) — swap the
store, keep the protocol.
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from cdk_datalake_ingest_upeu_spark.functions.localrel import rows_df as _rows_df

_MANIFEST_RE = re.compile(r"\d{8}\.json")
_CHECKPOINT_RE = re.compile(r"\d{8}\.checkpoint\.(parquet|json)")
_TAG_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9._-]*")
# rename targets stay plain identifiers: the pruning grammar, CHECK
# expressions, and unquoted user SQL all assume them
_COLNAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_TMP_RE = re.compile(r"\.tmp-[0-9a-f]{8}\.(json|parquet)")


class PosixLinkLogStore:
    """The commit primitive, seamed out of the table (Delta's LogStore
    abstraction): publish complete content at a path exactly once.

    POSIX strategy: write a temp file in the target's directory, then
    ``os.link`` it to the target — an atomic create-if-absent of the
    COMPLETE content (no reader ever sees a partial record;
    ``os.replace`` would silently clobber a racing winner). Object-store
    mapping, same contract, different primitive: S3 conditional PUT
    with ``If-None-Match: *`` (supported natively since 2024), GCS
    ``ifGenerationMatch=0``, ADLS ``If-None-Match: *`` — a LogStore for
    those is this one method re-targeted; every operator above the seam
    is unchanged.
    """

    @staticmethod
    def _write_tmp(target: str, content) -> str:
        d = os.path.dirname(target)
        os.makedirs(d, exist_ok=True)
        ext = "parquet" if target.endswith(".parquet") else "json"
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}.{ext}")
        if isinstance(content, bytes):
            with open(tmp, "wb") as fh:
                fh.write(content)
        else:
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(content)
        return tmp

    def put_if_absent(self, target: str, content) -> bool:
        """Atomically create ``target`` holding ``content`` (str or
        bytes); False when the path already exists (the
        optimistic-concurrency loss)."""
        tmp = self._write_tmp(target, content)
        try:
            os.link(tmp, target)
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)
        return True

    def put_overwrite(self, target: str, content) -> None:
        """Atomically publish ``content`` (str or bytes) at ``target``,
        replacing any prior content — for DERIVED artifacts only
        (checkpoints, tag refs), where racing writers produce identical
        or equally-valid content and last-writer-wins is correct."""
        tmp = self._write_tmp(target, content)
        os.replace(tmp, target)


# -- per-file column statistics (Delta's stats-in-the-log analog) ----------
#
# Every commit stores per-file [min, max] bounds for the exactly-
# representable atomic types (integers, float/double, string — decimals
# are EXCLUDED: a decimal bound rounded through a JSON double could sit
# strictly inside the true range and make a skip unsound; date/timestamp
# are excluded for the same literal-parsing reason). DELETE and MERGE
# use the bounds to prune candidate files WITHOUT the scan — the 100 TB
# upgrade path the module docstring names: candidate discovery becomes
# O(manifest), and only overlapping files pay IO.
#
# Pruning is strictly conservative: a file is skipped only when a
# recognized conjunct PROVES no row can match. Anything outside the
# supported fragment (OR/NOT/BETWEEN/IN anywhere, non-literal operands,
# unparsed conjuncts, missing stats, unknown bounds from NaN) keeps the
# file in the candidate set.

_STAT_ATOMS = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.StringType,
)

_PRUNE_BAIL_RE = re.compile(r"\b(or|not|between|in)\b", re.IGNORECASE)
_CMP_OPS = r"(==|<=|>=|<>|!=|=|<|>)"
_CMP_RE = re.compile(
    r"^`?([A-Za-z_][A-Za-z0-9_]*)`?\s*" + _CMP_OPS + r"\s*(.+?)$"
)
_REV_CMP_RE = re.compile(
    r"^(.+?)\s*" + _CMP_OPS + r"\s*`?([A-Za-z_][A-Za-z0-9_]*)`?$"
)
_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=",
         "=": "=", "==": "==", "<>": "<>", "!=": "!="}
_INT_RE = re.compile(r"[+-]?\d+")
_FLOAT_RE = re.compile(r"[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?")


def _stat_columns(schema: T.StructType) -> list[str]:
    return [
        f.name for f in schema.fields if isinstance(f.dataType, _STAT_ATOMS)
    ]


# -- column mapping (Delta's name-mode analog) -------------------------------
#
# RENAME/DROP COLUMN are zero-IO metadata commits: each field's
# StructField metadata carries a stable ``physical_name`` — the column
# name actually written into parquet — while the field's .name is the
# LOGICAL name users query. Data files are never rewritten for a
# rename; scans read by physical name and alias back to logical.
# Per-file stats are keyed by PHYSICAL name (stable across renames, so
# a rename invalidates no manifest bounds); pruning translates
# logical predicates through the mapping. A column re-added after a
# drop gets a FRESH uuid physical name (Delta's col-<uuid> scheme), so
# the dropped column's bytes never resurrect. Tables that never
# rename/drop carry no mapping metadata at all — identical layout and
# plans to pre-mapping tables. Public design: Delta Lake column
# mapping, name mode (delta.columnMapping.mode = 'name').

_PHYSICAL_KEY = "physical_name"


def _physical_names(schema: T.StructType) -> dict:
    """logical -> physical column name; identity until mapping is
    activated by the first rename/drop."""
    return {
        f.name: (f.metadata or {}).get(_PHYSICAL_KEY, f.name)
        for f in schema.fields
    }


def _mapping_active(schema: T.StructType) -> bool:
    return any(_PHYSICAL_KEY in (f.metadata or {}) for f in schema.fields)


def _physical_schema(schema: T.StructType) -> T.StructType:
    """The on-disk twin of a logical schema (metadata stripped — the
    physical schema exists only to drive the parquet reader)."""
    return T.StructType(
        [
            T.StructField(
                (f.metadata or {}).get(_PHYSICAL_KEY, f.name),
                f.dataType,
                f.nullable,
            )
            for f in schema.fields
        ]
    )


def _fresh_physical() -> str:
    """Physical name for a column BORN under active mapping: unique
    against every physical name ever used by this table (including
    dropped columns still present in old files), so re-adding a
    dropped column's logical name can never resurrect its bytes —
    Delta's col-<uuid> physical-name scheme."""
    return f"col-{uuid.uuid4().hex[:12]}"


def _widens(src: T.DataType, dst: T.DataType) -> bool:
    """True when ``src -> dst`` is a LOSSLESS type widening this
    engine supports — Delta Lake's type-widening matrix, restricted to
    the conversions Spark's parquet reader performs natively on
    narrow files under a wider read schema (verified: INT32 read as
    long/decimal, FLOAT as double):

    - integer chain: byte -> short -> int -> long
    - byte/short/int -> double (exact: |int| < 2^53)
    - float -> double
    - byte/short/int/long -> decimal(p, s>=0) with enough integer
      digits (3 / 5 / 10 / 20)

    long -> double is NOT widening (loses exactness past 2^53)."""
    _ichain = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    if isinstance(src, _ichain) and isinstance(dst, _ichain):
        return _ichain.index(type(src)) < _ichain.index(type(dst))
    if isinstance(src, (T.ByteType, T.ShortType, T.IntegerType)) and (
        isinstance(dst, T.DoubleType)
    ):
        return True
    if isinstance(src, T.FloatType) and isinstance(dst, T.DoubleType):
        return True
    if isinstance(src, _ichain) and isinstance(dst, T.DecimalType):
        need = {
            T.ByteType: 3, T.ShortType: 5,
            T.IntegerType: 10, T.LongType: 20,
        }[type(src)]
        return dst.scale >= 0 and (dst.precision - dst.scale) >= need
    return False


def _sanitize_user_schema(schema: T.StructType) -> T.StructType:
    """Strip the RESERVED ``physical_name`` metadata key from a
    user-supplied schema. Only this engine's rename/drop paths may
    mint physical names: a df whose schema round-tripped from an
    external system (e.g. a real column-mapped Delta table) could
    otherwise activate mapping with physical names the just-written
    files do not contain — every read would NULL-backfill real data."""
    if not _mapping_active(schema):
        return schema
    fields = []
    for f in schema.fields:
        md = {
            k: v for k, v in (f.metadata or {}).items()
            if k != _PHYSICAL_KEY
        }
        fields.append(T.StructField(f.name, f.dataType, f.nullable, md))
    return T.StructType(fields)


def _stat_value(v):
    """JSON-safe bound; NaN maps to None = UNKNOWN (never a fake bound —
    Spark's max returns NaN when any value is NaN)."""
    if isinstance(v, float) and not math.isfinite(v) and math.isnan(v):
        return None
    return v


def _split_top_and(cond: str) -> list[str] | None:
    """Top-level AND conjuncts of ``cond``; None when the condition
    leaves the supported fragment (OR/NOT/BETWEEN/IN anywhere — a
    mis-split inside those could fabricate a conjunct the predicate
    does not imply). Quote tracking follows Spark's lexer: inside a
    string literal a backslash escapes the next character and a
    doubled quote is an escaped quote — without both rules a
    predicate like ``c1 = 'x\\' AND c2 = 5 AND tail = \\'y'`` (ONE
    literal to Spark) would fabricate the conjunct ``c2 = 5`` and
    make pruning exclude files that DO contain matching rows."""
    if _PRUNE_BAIL_RE.search(cond):
        return None
    parts: list[str] = []
    cur: list[str] = []
    depth, quote, i, n = 0, None, 0, len(cond)
    while i < n:
        ch = cond[i]
        if quote:
            cur.append(ch)
            if ch == "\\" and i + 1 < n:
                # backslash escape: the next char (quote or not) is
                # part of the literal, never a closer
                cur.append(cond[i + 1])
                i += 2
                continue
            if ch == quote:
                if i + 1 < n and cond[i + 1] == quote:
                    # doubled quote = escaped quote, still in-string
                    cur.append(cond[i + 1])
                    i += 2
                    continue
                quote = None
            i += 1
            continue
        elif ch in ("'", '"'):
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif (
            depth == 0
            and cond[i:i + 3].upper() == "AND"
            and (i == 0 or not (cond[i - 1].isalnum() or cond[i - 1] == "_"))
            and (
                i + 3 >= n
                or not (cond[i + 3].isalnum() or cond[i + 3] == "_")
            )
        ):
            parts.append("".join(cur))
            cur = []
            i += 3
            continue
        else:
            cur.append(ch)
        i += 1
    if quote is not None:
        # unterminated string literal: the split is not trustworthy
        return None
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _strip_outer_parens(s: str) -> str:
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        whole = True
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i < len(s) - 1:
                    whole = False
                    break
        if not whole:
            break
        s = s[1:-1].strip()
    return s


def _parse_literal(tok: str):
    t = tok.strip()
    if _INT_RE.fullmatch(t):
        return int(t)
    if _FLOAT_RE.fullmatch(t):
        return float(t)
    if len(t) >= 2 and t[0] == t[-1] == "'" and "'" not in t[1:-1]:
        return t[1:-1]
    return None


def _comparable(a, b) -> bool:
    num = (int, float)
    return (isinstance(a, num) and isinstance(b, num)) or (
        isinstance(a, str) and isinstance(b, str)
    )


def _conjunct_excludes(
    file_stats: dict, col: str, op: str, lit, stat_cols: set | None
) -> bool:
    """True ONLY when no row of the file can satisfy ``col op lit``."""
    if col not in file_stats:
        # Sound to exclude ONLY when the caller vouches (via stat_cols,
        # the stat-supported columns of the CURRENT schema) that a file
        # containing this column would have had bounds collected for
        # it: then absence means the file predates the column (schema
        # evolution — reads as all NULL, comparison never TRUE) or the
        # file has zero rows. Without that knowledge the column might
        # simply be of an unsupported type — never exclude.
        return stat_cols is not None and col in stat_cols
    lo, hi = file_stats[col]
    lo_ok = lo is not None and _comparable(lit, lo)
    hi_ok = hi is not None and _comparable(lit, hi)
    if op in ("=", "=="):
        return (lo_ok and lit < lo) or (hi_ok and lit > hi)
    if op in ("<>", "!="):
        return lo_ok and hi_ok and lo == hi == lit
    if op == "<":
        return lo_ok and not (lo < lit)
    if op == "<=":
        return lo_ok and not (lo <= lit)
    if op == ">":
        return hi_ok and not (hi > lit)
    if op == ">=":
        return hi_ok and not (hi >= lit)
    return False


def prune_candidate_files(
    files: list[str],
    stats: dict,
    condition: str,
    stat_cols: set | None = None,
    rename: dict | None = None,
) -> list[str]:
    """Files that MAY contain a row matching ``condition``, judged from
    per-file [min, max] bounds — conservative data skipping. Files
    without stats are always candidates. ``stat_cols`` (the current
    schema's stat-supported columns) additionally lets a column MISSING
    from a file's bounds exclude it — sound only then, because absence
    proves schema-evolution NULL backfill or a zero-row file.
    ``rename`` (logical -> physical, from column mapping) translates
    the predicate's column names into the stats' key space — stats are
    keyed by PHYSICAL name, which is what keeps every manifest bound
    valid across renames. When a map is given it is the FULL logical
    schema: a conjunct naming a column outside it (a stale pre-rename
    name, a typo) contributes NO pruning — untranslated it could alias
    another column's physical key and silently exclude files, where
    the downstream filter would have raised."""
    parsed, stat_cols = _parsed_pruners(condition, stat_cols, rename)
    if not parsed:
        return list(files)
    return [
        f
        for f in files
        if f not in stats
        or not _stats_exclude(stats[f], parsed, stat_cols)
    ]


def _parsed_pruners(
    condition: str,
    stat_cols: set | None = None,
    rename: dict | None = None,
) -> tuple[list[tuple[str, str, object]], set | None]:
    """The pruning FRAGMENT of ``condition``: top-level AND conjuncts of
    the form ``col <op> literal`` parsed into (physical col, op, lit)
    triples, plus ``stat_cols`` translated into the same physical key
    space. Empty list when the condition contributes no pruning (then
    every file is a candidate — callers skip the per-file walk)."""
    conjuncts = _split_top_and(condition)
    if conjuncts is None:
        return [], stat_cols
    if stat_cols is not None and rename is not None:
        stat_cols = {rename.get(c, c) for c in stat_cols}

    def _col(name: str) -> str | None:
        if rename is None:
            return name
        return rename.get(name)

    parsed: list[tuple[str, str, object]] = []
    for c in conjuncts:
        c = _strip_outer_parens(c)
        m = _CMP_RE.fullmatch(c)
        if m:
            lit = _parse_literal(m.group(3))
            col = _col(m.group(1))
            if lit is not None and col is not None:
                parsed.append((col, m.group(2), lit))
                continue
        m = _REV_CMP_RE.fullmatch(c)
        if m:
            lit = _parse_literal(m.group(1))
            col = _col(m.group(3))
            if lit is not None and col is not None:
                parsed.append((col, _FLIP[m.group(2)], lit))
        # unrecognized conjunct: contributes no pruning
    return parsed, stat_cols


def _stats_exclude(
    st: dict | None,
    parsed: list[tuple[str, str, object]],
    stat_cols: set | None,
) -> bool:
    """True when ``st`` (one file's bounds) PROVES no row can match the
    parsed conjuncts — the single-file core of
    :func:`prune_candidate_files`, shared with the streaming
    checkpoint-scoped resolution so both paths prune identically."""
    if st is None:
        return False
    return any(
        _conjunct_excludes(st, col, op, lit, stat_cols)
        for col, op, lit in parsed
    )


def _rec_epoch_key(rec: dict) -> tuple[str | None, int] | None:
    """The (app_id, epoch) idempotence key a commit record carries, or
    None. Anonymous epochs live under the legacy ``epoch`` field;
    writer-namespaced ones under the separate ``app_epoch`` action
    (Delta's txn action), which legacy bare-epoch probes never read."""
    ae = rec.get("app_epoch")
    if ae is not None:
        return (ae["app_id"], ae["epoch"])
    e = rec.get("epoch")
    if e is not None:
        return (None, e)
    return None


class VersionNotFoundError(LookupError):
    """Requested version has no manifest (never committed, or vacuumed
    past its retention)."""


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first — the optimistic-
    concurrency loser signal (Delta's ConcurrentModificationException).
    The loser re-reads the latest manifest and retries its commit."""


class ConcurrentAppendError(ConcurrentCommitError):
    """A concurrent commit ADDED files this transaction's outcome
    depends on — rows its predicate may match (DELETE/MERGE) or table
    contents it replaces (OVERWRITE/RESTORE). Delta's
    ``ConcurrentAppendException``. The add-vs-predicate judgment uses
    the winner's own per-file [min, max] stats through
    :func:`prune_candidate_files`, so a provably-disjoint append never
    conflicts with a stats-prunable DELETE."""


class ConcurrentDeleteDeleteError(ConcurrentCommitError):
    """A concurrent commit REMOVED a file this transaction also
    removes — two writers rewrote/deleted the same data. Delta's
    ``ConcurrentDeleteDeleteException``."""


class ConcurrentDeleteReadError(ConcurrentCommitError):
    """A concurrent commit REMOVED (or re-masked via deletion vectors)
    a file this transaction READ — its outcome was computed from data
    that no longer exists at the rebased version. Delta's
    ``ConcurrentDeleteReadException``."""


class MetadataChangedError(ConcurrentCommitError):
    """A concurrent commit changed the table's schema or CHECK
    constraints between this transaction's snapshot and its commit.
    Delta's ``MetadataChangedException`` — retry from a fresh
    snapshot so enforcement/evolution sees the new metadata."""


class ConstraintViolationError(ValueError):
    """An incoming batch violates a table CHECK constraint — Delta's
    ``DeltaInvariantViolationException``. The commit is refused and the
    table is unchanged."""


class TableFeatureError(RuntimeError):
    """The table's commit log requires a protocol feature this engine
    does not implement — Delta's table-features gate
    (``minReaderVersion``/``readerFeatures``). Failing CLOSED here is
    the point: a reader that ignored, say, an unknown deletion-vector
    encoding would silently resurrect deleted rows."""


# commit-retry bound: each rebase re-checks only the NEW winners since
# the last attempt, so the loop is O(concurrent commits), and the bound
# only trips when another writer keeps winning the race for this long
_MAX_COMMIT_REBASES = 20

# protocol features THIS engine implements. Reader features change what
# a correct READ requires (ignoring one corrupts results); writer
# features change only what a correct WRITE must maintain (a pure
# reader may ignore them). Commit records declare the features their
# content actually uses; resolution accumulates the union and gates.
_READER_FEATURES = frozenset({
    "deletion-vectors",      # dv field masks rows via sidecars
    "rle-deletion-vectors",  # sidecars hold run-length (start, n) rows
    "column-mapping",        # fields carry stable physical_name; scans
                             # must read by physical name (Delta's
                             # columnMapping name mode)
    "type-widening",         # files narrower than the schema exist;
                             # readers must upcast narrow parquet under
                             # the wider read schema (Delta's
                             # typeWidening feature)
})
_WRITER_FEATURES = frozenset({
    "check-constraints",     # batches must satisfy table CHECKs
    "txn-epochs",            # epoch ids make commits idempotent
    "txn-app-ids",           # epochs are namespaced per writer id
                             # (Delta's txn {appId, version}); a writer
                             # that keys idempotence on the bare epoch
                             # integer would mis-read these records
    "column-mapping",        # writers must land batches under physical
                             # names and mint fresh ones for new columns
    "type-widening",         # writers must preserve widened schemas
                             # (never re-narrow on schema comparison)
})


class _LazyCheckpointStats:
    """Per-file stats of a resolved snapshot, backed by a columnar
    checkpoint whose ``stats`` column is NOT read until some caller
    actually needs bounds. File-list-only resolutions — ``read()``,
    ``changes()``'s manifest diff, vacuum's reference walk — therefore
    never deserialize a single stats JSON string, which is what keeps
    driver-side snapshot materialization narrow at 10^6-file scale
    (the checkpoint's path/dv columns are the only ones decoded).
    Mapping-shaped: pruning code uses ``in``/``get``/``[]`` unchanged;
    the first such access reads the checkpoint's path+stats columns
    once (one counted ``stats_loads`` event on the owning table) and
    decodes JSON per accessed file, memoized. Chain deltas layer on
    top via ``update``/``pop`` without any load."""

    def __init__(self, owner, cp_path: str):
        self._owner = owner
        self._cp_path = cp_path
        self._decoded: dict = {}
        self._removed: set = set()
        self._live: set | None = None
        self._raw: dict | None = None

    def _load(self) -> None:
        if self._raw is not None:
            return
        import pyarrow.parquet as pq

        try:
            tbl = pq.read_table(self._cp_path, columns=["path", "stats"])
        except (FileNotFoundError, OSError) as exc:
            # the deferred read races vacuum: another writer may have
            # dropped this checkpoint after our snapshot resolved.
            # Degrade to NO stats — sound by the pruning contract
            # (files without bounds are always candidates), so the
            # holder's lookup/merge/delete stays CORRECT, just unpruned
            # — where a crash here would fail work an eager decode
            # would have completed.
            self._owner._last_stats_load_error = exc
            self._raw = {}
            return
        self._owner._stats_loads += 1
        self._raw = {
            p: s
            for p, s in zip(
                tbl.column("path").to_pylist(),
                tbl.column("stats").to_pylist(),
            )
            if s is not None
        }

    def _visible(self, key) -> bool:
        if key in self._removed:
            return False
        return self._live is None or key in self._live or (
            key in self._decoded
        )

    def __contains__(self, key) -> bool:
        if key in self._decoded:
            return True
        if not self._visible(key):
            return False
        self._load()
        return key in self._raw

    def __getitem__(self, key):
        if key in self._decoded:
            return self._decoded[key]
        if not self._visible(key):
            raise KeyError(key)
        self._load()
        v = json.loads(self._raw[key])
        self._decoded[key] = v
        return v

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def raw_json(self, key) -> str | None:
        """The stats JSON string for ``key`` without a decode/encode
        round-trip — the checkpoint writer's passthrough."""
        if key in self._decoded:
            return json.dumps(self._decoded[key])
        if not self._visible(key):
            return None
        self._load()
        return self._raw.get(key)

    def pop(self, key, default=None):
        # deliberately lazy: returns the decoded value only if one is
        # already materialized (resolution's only caller discards the
        # return) — a strict dict.pop would force the column load on
        # every chain delta that removes a file
        out = self._decoded.pop(key, default)
        self._removed.add(key)
        return out

    def update(self, other: dict) -> None:
        self._decoded.update(other)
        self._removed.difference_update(other)

    def prune_to(self, live) -> None:
        """Restrict visibility to ``live`` file keys — O(decoded), no
        load; checkpoint-resident keys outside ``live`` just become
        invisible."""
        live = set(live)
        self._live = live
        self._decoded = {
            k: v for k, v in self._decoded.items() if k in live
        }

    # full-materialization surface (introspection / checkpoint write):
    # these DO load — callers here genuinely need every bound

    def _all_keys(self) -> list:
        self._load()
        keys = set(self._decoded) | (set(self._raw) - self._removed)
        if self._live is not None:
            keys = {
                k for k in keys if k in self._live or k in self._decoded
            }
        return sorted(keys)

    def __iter__(self):
        return iter(self._all_keys())

    def __len__(self) -> int:
        return len(self._all_keys())

    def __bool__(self) -> bool:
        # cheap and conservative: an unbacked empty overlay is falsy,
        # anything checkpoint-backed is truthy without a load (callers
        # use truthiness only as a skip-pruning fast path)
        return True

    def keys(self):
        return self._all_keys()

    def values(self):
        return [self[k] for k in self._all_keys()]

    def items(self):
        return [(k, self[k]) for k in self._all_keys()]


class VersionedStageTable:
    """A parquet stage table with a Delta-style commit log.

    Commits (``overwrite`` / ``append`` / ``merge``) each produce a new
    immutable version; :meth:`read` accepts ``version=`` for time
    travel; :meth:`vacuum` reclaims files unreferenced by the retained
    versions. See the module docstring for the on-disk protocol.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        log_store: PosixLinkLogStore | None = None,
        checkpoint_interval: int = 10,
    ):
        if checkpoint_interval < 1:
            raise ValueError("checkpoint_interval must be >= 1")
        self.spark = spark
        self.path = os.fspath(path)
        self.log_dir = os.path.join(self.path, "_log")
        self.data_dir = os.path.join(self.path, "data")
        self.log_store = log_store or PosixLinkLogStore()
        self.checkpoint_interval = checkpoint_interval
        # resolved-snapshot memo: versions are immutable once committed,
        # so entries never go stale — except vacuum, which drops
        # versions and therefore clears the cache (Delta's snapshot
        # cache has the same per-instance scope). Bounded FIFO so a
        # history walk cannot hold every snapshot alive.
        self._snapshot_cache: dict[int, dict] = {}
        self._snapshot_cache_max = 16
        # memo of PARTIAL (stats-pruned) snapshots keyed by
        # (version, condition): a repeated identical lookup must not
        # re-stream the checkpoint — same once-per-snapshot guarantee
        # the full-path memo gives, at O(candidates) per entry
        self._pruned_cache: dict[tuple[int, str], dict] = {}
        self._pruned_cache_max = 8
        # observability: physical log reads (commit records +
        # checkpoints) — lets tests pin that repeated reads of one
        # version resolve the log exactly once
        self._log_reads = 0
        # observability: checkpoint STATS-column loads — lets tests pin
        # that file-list-only resolutions (read/changes/vacuum) never
        # deserialize per-file stats (the 10^6-file driver-width axis)
        self._stats_loads = 0
        # observability: file-list entries materialized into driver
        # Python (checkpoint to_pylist + pruned-resolution survivors) —
        # lets tests pin that a stats-scoped lookup on a checkpointed
        # table materializes O(candidates), never O(table files)
        self._files_materialized = 0
        self._last_checkpoint_error: Exception | None = None
        # set when a deferred stats load found its checkpoint vacuumed
        # (the holder degraded to unpruned-but-correct)
        self._last_stats_load_error: Exception | None = None
        # (app_id, epoch) -> version map for idempotent streaming
        # commits — Delta's txn {appId, version} discipline, so two
        # writers' epoch counters live in DISJOINT namespaces and can
        # never collide (app_id None is the legacy/anonymous space).
        # Built INCREMENTALLY: each check scans only records newer
        # than the last scan (a 10^4-commit table's per-batch epoch
        # check is O(new commits), not O(log)). Delta's txn actions
        # carry the same in its checkpoints.
        self._epoch_versions: dict[tuple[str | None, int], int] = {}
        self._epoch_scan_upto = -1
        # lazily seed the map from the newest checkpoint's txn footer
        # (see _seed_epochs_from_checkpoint) before the first probe
        self._epoch_seeded = False

    # -- log bookkeeping ---------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        # only 8-digit committed manifests count: a process dying between
        # os.link and the finally-os.remove in _commit can leak a
        # .tmp-<uuid>.json into _log/, and int() on that name would
        # otherwise poison every subsequent read/commit/vacuum — the
        # exact crash the commit protocol exists to survive.
        return sorted(
            int(f[:-5])
            for f in os.listdir(self.log_dir)
            if _MANIFEST_RE.fullmatch(f)
        )

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise VersionNotFoundError(f"{self.path}: no commits")
        return vs[-1]

    def _commit_record(self, version: int) -> dict:
        """The raw on-disk record for one commit — delta-encoded
        (``add``/``remove``) in the current format, or a legacy full
        ``files`` snapshot (still accepted: such a record is
        self-contained and resets resolution)."""
        p = os.path.join(self.log_dir, f"{version:08d}.json")
        if not os.path.exists(p):
            raise VersionNotFoundError(
                f"{self.path}: version {version} not found "
                f"(have {self.versions()})"
            )
        self._log_reads += 1
        with open(p, "r", encoding="utf-8") as fh:
            return json.load(fh)

    def checkpoints(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            {
                int(f[:8])
                for f in os.listdir(self.log_dir)
                if _CHECKPOINT_RE.fullmatch(f)
            }
        )

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(
            self.log_dir, f"{version:08d}.checkpoint.parquet"
        )

    def _write_checkpoint(self, version: int) -> None:
        """Publish the resolved snapshot of ``version`` as a COLUMNAR
        (parquet) checkpoint — derived data (last-writer-wins is safe:
        two writers checkpointing the same version serialize identical
        content). Layout is Delta's: one row per live data file with
        ``path`` / ``stats`` (per-file bounds as a JSON string column) /
        ``dv`` (sidecar list) columns, and the table-wide singletons
        (version, schema, constraints) in the parquet footer's
        key-value metadata — so the footer answers "what schema?"
        without touching a row, and a file-list-only reader prunes the
        stats/dv columns. Written driver-side via pyarrow: no Spark job
        on the commit path."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        snap = self._manifest(version)
        files = snap["files"]
        stats = snap.get("stats") or {}
        dv = snap.get("dv") or {}
        # accumulated (app_id, epoch) -> version map, Delta's checkpoint
        # txn actions: without it, vacuum dropping old commit records
        # would forget their epochs and a late-replayed batch whose
        # epoch lived only in a dropped record double-lands. Seeded from
        # the PREVIOUS checkpoint's footer (chained accumulation — one
        # O(interval) record walk per checkpoint, never O(log)), then
        # extended with the records since it.
        txn_map: dict = {}
        anchor = -1
        prior = [c for c in self.checkpoints() if c < version]
        if prior:
            prior_path = self._checkpoint_path(prior[-1])
            if os.path.exists(prior_path):
                try:
                    pmeta = (
                        pq.ParquetFile(prior_path).schema_arrow.metadata
                        or {}
                    )
                    raw = pmeta.get(b"txn")
                    if raw is not None:
                        txn_map = {
                            (a, int(e)): int(v)
                            for a, e, v in json.loads(raw.decode())
                        }
                        anchor = prior[-1]
                except (OSError, ValueError):
                    pass  # unreadable/legacy prior: full record walk
        for u in self.versions():
            if anchor < u <= version:
                key = _rec_epoch_key(self._commit_record(u))
                if key is not None:
                    txn_map[key] = u
        if isinstance(stats, _LazyCheckpointStats):
            # passthrough: re-checkpoint raw JSON strings without a
            # decode/encode round-trip per file
            stats_col = [stats.raw_json(f) for f in files]
        else:
            stats_col = [
                json.dumps(stats[f]) if f in stats else None
                for f in files
            ]
        tbl = pa.table(
            {
                "path": pa.array(files, pa.string()),
                "stats": pa.array(stats_col, pa.string()),
                "dv": pa.array(
                    [dv.get(f) for f in files], pa.list_(pa.string())
                ),
            }
        ).replace_schema_metadata(
            {
                b"version": str(version).encode(),
                b"schema": snap["schema"].encode(),
                b"constraints": json.dumps(
                    snap.get("constraints") or {}
                ).encode(),
                b"protocol": json.dumps(
                    snap.get("protocol") or {}
                ).encode(),
                b"txn": json.dumps(
                    [[a, e, v] for (a, e), v in sorted(
                        txn_map.items(),
                        key=lambda kv: (kv[0][0] or "", kv[0][1]),
                    )]
                ).encode(),
            }
        )
        buf = pa.BufferOutputStream()
        pq.write_table(tbl, buf)
        self.log_store.put_overwrite(
            self._checkpoint_path(version), buf.getvalue().to_pybytes()
        )

    def _read_checkpoint(self, version: int) -> dict:
        """Load a checkpoint as the resolved-snapshot dict. Prefers the
        columnar parquet form — COLUMN-PRUNED: only ``path`` and ``dv``
        are decoded here (the table singletons live in the footer);
        ``stats`` comes back as a :class:`_LazyCheckpointStats` that
        reads its column only when some caller actually prunes on
        bounds, so a file-list-only resolution at 10^6 files never
        deserializes 10^6 stats JSON strings on the driver. Falls back
        to the legacy monolithic JSON (pre-r11 tables stay readable)."""
        import pyarrow.parquet as pq

        self._log_reads += 1
        p = self._checkpoint_path(version)
        if not os.path.exists(p):
            legacy = os.path.join(
                self.log_dir, f"{version:08d}.checkpoint.json"
            )
            with open(legacy, encoding="utf-8") as fh:
                return json.load(fh)
        tbl = pq.read_table(p, columns=["path", "dv"])
        meta = tbl.schema.metadata or {}
        files = tbl.column("path").to_pylist()
        self._files_materialized += len(files)
        dv = {
            f: list(s)
            for f, s in zip(files, tbl.column("dv").to_pylist())
            if s
        }
        return {
            "version": int(meta[b"version"].decode()),
            "files": files,
            "schema": meta[b"schema"].decode(),
            "constraints": json.loads(
                meta.get(b"constraints", b"{}").decode()
            ),
            "protocol": json.loads(
                meta.get(b"protocol", b"{}").decode()
            ),
            "stats": _LazyCheckpointStats(self, p),
            "dv": dv,
        }

    def _manifest(self, version: int) -> dict:
        """The RESOLVED snapshot at ``version``: complete file list,
        schema, constraints, and accumulated per-file stats, plus the
        commit's own op/committed_at/epoch/metrics. Resolution anchors
        at the newest checkpoint <= version (or at genesis / a legacy
        full-snapshot record) and applies at most
        ``checkpoint_interval`` delta records — never the whole log.
        Resolved snapshots are MEMOIZED per instance (committed
        versions are immutable; vacuum clears the cache because it can
        drop versions): repeated read()/lookup() of one version pays
        the log resolution exactly once. Callers must treat the
        returned snapshot as read-only."""
        cached = self._snapshot_cache.get(version)
        if cached is not None:
            return dict(cached)
        rec = self._commit_record(version)
        if "files" in rec:
            # legacy full-snapshot record: self-contained
            self._cache_snapshot(version, rec)
            return dict(rec)
        cps = [c for c in self.checkpoints() if c <= version]
        start = -1
        files: list[str] = []
        stats: dict = {}
        dv: dict = {}
        schema = None
        constraints: dict = {}
        proto_reader: set = set()
        proto_writer: set = set()
        if cps:
            cp = self._read_checkpoint(cps[-1])
            start = cps[-1]
            files = list(cp["files"])
            cp_stats = cp.get("stats")
            # keep the lazy object AS the accumulator: chain deltas
            # (update/pop) layer on it without forcing the column load
            stats = (
                cp_stats
                if isinstance(cp_stats, _LazyCheckpointStats)
                else dict(cp_stats or {})
            )
            dv = {f: list(s) for f, s in (cp.get("dv") or {}).items()}
            schema = cp["schema"]
            constraints = dict(cp.get("constraints") or {})
            proto_reader.update((cp.get("protocol") or {}).get("reader", ()))
            proto_writer.update((cp.get("protocol") or {}).get("writer", ()))
        chain = [u for u in self.versions() if start < u <= version]
        if chain != list(range(start + 1, version + 1)):
            raise VersionNotFoundError(
                f"{self.path}: version {version} is not resolvable — "
                f"commit chain {chain} from anchor {start} has gaps "
                f"(vacuumed past retention?)"
            )
        fset = set(files)
        last = rec
        for u in chain:
            r = rec if u == version else self._commit_record(u)
            if "files" in r:
                # legacy snapshot record mid-chain: resolution resets
                # (including any lazy checkpoint backing)
                fset = set(r["files"])
                stats = dict(r.get("stats") or {})
                dv = {}
            else:
                removed = r.get("remove") or []
                fset.difference_update(removed)
                for f in removed:
                    stats.pop(f, None)
                    dv.pop(f, None)
                fset.update(r.get("add") or [])
                stats.update(r.get("stats") or {})
                # deletion-vector sidecars UNION per file (a file's DV
                # only grows until the file is removed/rewritten; a
                # restore that must SHRINK a dv lists the file in both
                # remove and add, which resets it here first)
                for f, sidecars in (r.get("dv") or {}).items():
                    cur = dv.setdefault(f, [])
                    for s in sidecars:
                        if s not in cur:
                            cur.append(s)
            schema = r["schema"]
            constraints = dict(r.get("constraints") or {})
            # protocol is MONOTONE over history (Delta's is too): a
            # feature once required stays required — union, never reset
            proto_reader.update((r.get("protocol") or {}).get("reader", ()))
            proto_writer.update((r.get("protocol") or {}).get("writer", ()))
            last = r
        unknown = proto_reader - _READER_FEATURES
        if unknown:
            raise TableFeatureError(
                f"{self.path}: version {version} requires reader "
                f"feature(s) {sorted(unknown)} this engine does not "
                f"implement; reading anyway could corrupt results — "
                f"upgrade the engine"
            )
        out = {
            "version": version,
            "op": last["op"],
            "files": sorted(fset),
            "schema": schema,
            "committed_at": last.get("committed_at", 0.0),
        }
        if constraints:
            out["constraints"] = constraints
        if isinstance(stats, _LazyCheckpointStats):
            # restrict to live files WITHOUT materializing: the stats
            # column stays unread until a pruning caller needs bounds
            stats.prune_to(out["files"])
            out["stats"] = stats
        else:
            kept_stats = {
                f: stats[f] for f in out["files"] if f in stats
            }
            if kept_stats:
                out["stats"] = kept_stats
        kept_dv = {f: dv[f] for f in out["files"] if f in dv and dv[f]}
        if kept_dv:
            out["dv"] = kept_dv
        if proto_reader or proto_writer:
            out["protocol"] = {
                "reader": sorted(proto_reader),
                "writer": sorted(proto_writer),
            }
        ekey = _rec_epoch_key(last)
        if ekey is not None:
            out["epoch"] = ekey[1]
            if ekey[0] is not None:
                out["app_id"] = ekey[0]
        if "metrics" in last:
            out["metrics"] = last["metrics"]
        self._cache_snapshot(version, out)
        return dict(out)

    def _cache_snapshot(self, version: int, snap: dict) -> None:
        if len(self._snapshot_cache) >= self._snapshot_cache_max:
            # FIFO eviction: the oldest inserted entry goes (dict
            # preserves insertion order)
            self._snapshot_cache.pop(next(iter(self._snapshot_cache)))
        self._snapshot_cache[version] = snap

    def _manifest_pruned(self, version: int, condition: str) -> dict | None:
        """Checkpoint-anchored PARTIAL snapshot for a predicate: only
        the files whose manifest bounds cannot exclude ``condition``'s
        pruning fragment materialize into driver Python. Thin wrapper
        over :meth:`_resolve_pruned` (which carries the streaming
        machinery); repeated identical conditions hit the partial-
        snapshot memo."""

        def build(schema: T.StructType):
            parsed, stat_cols = _parsed_pruners(
                condition,
                set(_stat_columns(schema)),
                _physical_names(schema),
            )
            if not parsed:
                return None  # no pruning fragment: full path as good
            return lambda st: _stats_exclude(st, parsed, stat_cols)

        return self._resolve_pruned(version, build, memo_key=condition)

    def _manifest_pruned_keys(
        self,
        version: int,
        source: DataFrame,
        key_columns: list[str],
        envelope: dict | None = None,
    ) -> dict | None:
        """Checkpoint-anchored PARTIAL snapshot for a KEYED write
        (MERGE / delete_keys): the pruning judge is the source batch's
        per-key-column [min, max] envelope — exactly
        :meth:`_prune_merge_candidates`'s per-file test (missing key
        column excludes: the file predates the column, an equi-join
        can never match), applied WHILE streaming the checkpoint, so a
        keyed write against a 10^6-file table materializes only its
        candidate files driver-side. One bounded aggregation over the
        batch (2 scalars per key column); not memoized — every batch
        has its own envelope. ``envelope`` (col -> (min, max), raw
        aggregate values) lets a caller that already paid a pass over
        the source (merge's multiple-match probe) hand the bounds in
        instead of paying a second aggregation — only columns the
        CHECKPOINT schema types as stat atoms are used, exactly the
        set the in-house aggregation would have covered."""

        def build(schema: T.StructType):
            by_name = {f.name: f.dataType for f in schema.fields}
            phys = _physical_names(schema)
            cols = [
                c for c in key_columns
                if isinstance(by_name.get(c), _STAT_ATOMS)
            ]
            if envelope is not None:
                # a key column the checkpoint types as a stat atom but
                # the caller's envelope lacks (source typed it outside
                # _STAT_ATOMS) simply contributes no predicate — less
                # pruning, never a fabricated exclusion
                cols = [c for c in cols if c in envelope]
            if not cols:
                return None
            if envelope is not None:
                vals = {c: envelope[c] for c in cols}
            else:
                aggs = []
                for i, c in enumerate(cols):
                    aggs.append(F.min(F.col(f"`{c}`")).alias(f"__mn{i}"))
                    aggs.append(F.max(F.col(f"`{c}`")).alias(f"__mx{i}"))
                row = source.agg(*aggs).first()
                vals = {
                    c: (row[f"__mn{i}"], row[f"__mx{i}"])
                    for i, c in enumerate(cols)
                }
            parsed: list[tuple[str, str, object]] = []
            pset = set()
            for c in cols:
                pc = phys.get(c, c)
                mn = _stat_value(vals[c][0])
                mx = _stat_value(vals[c][1])
                if mn is not None:
                    parsed.append((pc, ">=", mn))
                if mx is not None:
                    parsed.append((pc, "<=", mx))
                if mn is not None or mx is not None:
                    pset.add(pc)
            if not parsed:
                return None  # all-NULL envelope: no pruning power
            return lambda st: _stats_exclude(st, parsed, pset)

        return self._resolve_pruned(version, build)

    def _resolve_pruned(
        self,
        version: int,
        build_excluder,
        memo_key: str | None = None,
        path_set: set | None = None,
    ) -> dict | None:
        """Stream-resolve a PARTIAL snapshot at ``version``: anchor at
        the newest columnar checkpoint, judge every row with the
        excluder ``build_excluder(schema)`` returns, keep survivors
        only, then apply the chain deltas (their adds judged by record
        stats). The partial carries version/schema/constraints/protocol
        plus candidate files/stats/dv and ``n_files_total`` (the FULL
        live-file count, maintained without materializing paths) so
        mutators can distinguish an empty table from an empty candidate
        set. Driver memory is O(candidates + one record batch) — the
        10^6-file driver-width shape, Delta's partition-scoped log
        replay.

        ``path_set`` restricts the partial to a KNOWN file set (the
        change feed's symmetric-difference files): rows are judged by
        path membership BEFORE their stats JSON is ever decoded, then
        by the excluder as usual.

        ``build_excluder=None`` is HEADER-ONLY mode: no row is ever
        read — the live-file count comes from the checkpoint's parquet
        row count plus the chain's add/remove counts, and the partial
        carries only the table-wide singletons (version, schema,
        constraints, protocol, ``n_files_total``) with an empty file
        list. The O(1) resolution for callers that need table metadata
        and an exact count but bring their own file scope (incremental
        ZORDER's chain-derived tail).

        Returns None — caller falls back to full resolution — when the
        excluder builder declines (no pruning power), no columnar
        checkpoint anchors at-or-before ``version``, a legacy snapshot
        interrupts the chain, the full snapshot is already cached
        in memory, or a concurrent vacuum dropped the anchor checkpoint
        between the exists-probe and the read (the same degrade-to-
        correct posture as _LazyCheckpointStats._load). Partial
        snapshots never enter the snapshot cache; ``memo_key``
        (predicate callers) keys the small partial memo."""
        import pyarrow.parquet as pq

        if version in self._snapshot_cache:
            # the complete snapshot is already materialized — pruning
            # the in-memory list beats re-streaming the checkpoint
            return None
        if memo_key is not None:
            memo = self._pruned_cache.get((version, memo_key))
            if memo is not None:
                return dict(memo)
        rec = self._commit_record(version)
        if "files" in rec:
            return None  # legacy full-snapshot record: already tiny
        cps = [c for c in self.checkpoints() if c <= version]
        if not cps:
            return None
        anchor = cps[-1]
        cp_path = self._checkpoint_path(anchor)
        if not os.path.exists(cp_path):
            return None  # legacy JSON checkpoint
        chain = [u for u in self.versions() if anchor < u <= version]
        if chain != list(range(anchor + 1, version + 1)):
            raise VersionNotFoundError(
                f"{self.path}: version {version} is not resolvable — "
                f"commit chain {chain} from anchor {anchor} has gaps "
                f"(vacuumed past retention?)"
            )
        chain_recs = [
            rec if u == version else self._commit_record(u)
            for u in chain
        ]
        if any("files" in r for r in chain_recs):
            return None  # legacy snapshot mid-chain: resolution resets
        # build the excluder against the FINAL schema — sound for every
        # file regardless of commit age, because stats are keyed by
        # stable PHYSICAL names. When chain records exist the schema
        # comes from the last one, so a no-pruning-power judge bails
        # before the checkpoint file is even opened.
        header_only = build_excluder is None
        exclude = None
        schema_json = chain_recs[-1]["schema"] if chain_recs else None
        if schema_json is not None and not header_only:
            schema = T.StructType.fromJson(json.loads(schema_json))
            exclude = build_excluder(schema)
            if exclude is None:
                return None
        try:
            pf = pq.ParquetFile(cp_path)
            meta = pf.schema_arrow.metadata or {}
            if schema_json is None:
                schema_json = meta[b"schema"].decode()
                if not header_only:
                    schema = T.StructType.fromJson(json.loads(schema_json))
                    exclude = build_excluder(schema)
                    if exclude is None:
                        return None
            proto = json.loads(meta.get(b"protocol", b"{}").decode())
            proto_reader = set(proto.get("reader", ()))
            proto_writer = set(proto.get("writer", ()))
            constraints = json.loads(
                meta.get(b"constraints", b"{}").decode()
            )
            self._log_reads += 1
            files: list[str] = []
            stats: dict = {}
            dv: dict = {}
            if header_only:
                # no row is read: the parquet footer already knows the
                # live-file count at the anchor
                n_total = pf.metadata.num_rows
            else:
                # stream the checkpoint: one pass over path/stats/dv,
                # survivors only ever reach Python
                self._stats_loads += 1
                n_total = 0  # FULL live-file count, no paths materialized
                for batch in pf.iter_batches(
                    columns=["path", "stats", "dv"], batch_size=8192
                ):
                    n_total += batch.num_rows
                    paths = batch.column(0)
                    stats_col = batch.column(1)
                    dv_col = batch.column(2)
                    for i in range(batch.num_rows):
                        f = paths[i].as_py()
                        if path_set is not None and f not in path_set:
                            continue
                        raw = stats_col[i].as_py()
                        st = json.loads(raw) if raw else None
                        if exclude(st):
                            continue
                        files.append(f)
                        if st:
                            stats[f] = st
                        s = dv_col[i].as_py()
                        if s:
                            dv[f] = list(s)
        except (FileNotFoundError, OSError) as exc:
            # a concurrent writer's vacuum can drop the checkpoint
            # between the exists-probe above and the read — degrade to
            # the full path (unpruned but correct), exactly like
            # _LazyCheckpointStats._load
            self._last_checkpoint_error = exc
            return None
        fset = set(files)
        for r in chain_recs:
            removed = r.get("remove") or []
            # removes always name live files (commit protocol), so the
            # running total stays exact without knowing the paths
            n_total -= len(removed)
            fset.difference_update(removed)
            for f in removed:
                stats.pop(f, None)
                dv.pop(f, None)
            r_stats = r.get("stats") or {}
            adds = r.get("add") or []
            n_total += len(adds)
            if not header_only:
                for f in adds:
                    if path_set is not None and f not in path_set:
                        continue
                    st = r_stats.get(f)
                    if exclude(st):
                        continue
                    fset.add(f)
                    if st:
                        stats[f] = st
                for f, sidecars in (r.get("dv") or {}).items():
                    if f not in fset:
                        continue  # pruned-out or removed: mask irrelevant
                    cur = dv.setdefault(f, [])
                    for s in sidecars:
                        if s not in cur:
                            cur.append(s)
            # wholesale replace is sound ONLY because every commit
            # record carries the table's FULL constraints dict (the
            # _commit signature has no partial form) — mirror of
            # _manifest's own chain step; a future partial-constraints
            # record must change both sites together
            constraints = dict(r.get("constraints") or {})
            proto_reader.update((r.get("protocol") or {}).get("reader", ()))
            proto_writer.update((r.get("protocol") or {}).get("writer", ()))
        unknown = proto_reader - _READER_FEATURES
        if unknown:
            raise TableFeatureError(
                f"{self.path}: version {version} requires reader "
                f"feature(s) {sorted(unknown)} this engine does not "
                f"implement; reading anyway could corrupt results — "
                f"upgrade the engine"
            )
        out = {
            "version": version,
            "files": sorted(fset),
            "schema": schema_json,
            "n_files_total": n_total,
        }
        self._files_materialized += len(out["files"])
        kept_stats = {f: stats[f] for f in out["files"] if f in stats}
        if kept_stats:
            out["stats"] = kept_stats
        kept_dv = {f: dv[f] for f in out["files"] if f in dv and dv[f]}
        if kept_dv:
            out["dv"] = kept_dv
        if constraints:
            out["constraints"] = constraints
        if proto_reader or proto_writer:
            out["protocol"] = {
                "reader": sorted(proto_reader),
                "writer": sorted(proto_writer),
            }
        if memo_key is not None:
            if len(self._pruned_cache) >= self._pruned_cache_max:
                self._pruned_cache.pop(next(iter(self._pruned_cache)))
            self._pruned_cache[(version, memo_key)] = out
        return dict(out)

    def _epoch_version(
        self, epoch: int, app_id: str | None = None
    ) -> int | None:
        """Version already committed under ``(app_id, epoch)``, or None
        — Delta's txn {appId, version} lookup: each writer identity
        owns its own epoch counter, so an applier's derived sub-epochs
        can never collide with another writer's raw epochs. ``app_id``
        None probes the legacy/anonymous namespace only. The scan over
        commit records is incremental per instance — only records
        newer than the previous check are read, so a streaming writer's
        per-batch idempotence probe costs O(commits since last batch),
        never O(log). The first probe on an instance additionally seeds
        the map from the newest checkpoint's txn footer — epochs whose
        commit records were vacuumed stay visible (Delta reads txn
        state from its checkpoints the same way), so exactly-once
        survives retention."""
        if not self._epoch_seeded:
            self._epoch_seeded = True
            self._seed_epochs_from_checkpoint()
        vs = self.versions()
        for v in vs:
            if v > self._epoch_scan_upto:
                key = _rec_epoch_key(self._commit_record(v))
                if key is not None:
                    self._epoch_versions[key] = v
        if vs:
            self._epoch_scan_upto = max(
                self._epoch_scan_upto, vs[-1]
            )
        return self._epoch_versions.get((app_id, epoch))

    def _seed_epochs_from_checkpoint(self) -> None:
        """Load the accumulated (app_id, epoch) -> version map from the
        newest columnar checkpoint's ``txn`` footer into the in-memory
        map and fast-forward the incremental record scan past the
        checkpoint. Checkpoints without the footer (pre-txn format)
        leave the full record walk in place — legacy tables keep their
        old (record-scan-only) visibility."""
        import pyarrow.parquet as pq

        for cp in reversed(self.checkpoints()):
            p = self._checkpoint_path(cp)
            if not os.path.exists(p):
                continue  # legacy JSON checkpoint: no txn footer
            try:
                meta = pq.ParquetFile(p).schema_arrow.metadata or {}
                raw = meta.get(b"txn")
                if raw is None:
                    return  # pre-txn checkpoint format
                entries = [
                    (a, int(e), int(v))
                    for a, e, v in json.loads(raw.decode())
                ]
            except (OSError, ValueError):
                continue  # racing vacuum / corrupt footer: degrade to
                # an older checkpoint or the full record walk
            self._log_reads += 1
            for a, e, v in entries:
                self._epoch_versions[(a, e)] = v
            self._epoch_scan_upto = max(self._epoch_scan_upto, cp)
            return

    def _commit(
        self,
        op: str,
        *,
        add: list[str] | tuple = (),
        remove: list[str] | tuple = (),
        schema_json: str,
        epoch: int | None = None,
        app_id: str | None = None,
        committed_at: float | None = None,
        version: int | None = None,
        constraints: dict | None = None,
        stats: dict | None = None,
        metrics: dict | None = None,
        dv: dict | None = None,
        txn: dict | None = None,
        features: dict | None = None,
    ) -> int:
        """Atomically publish ``version`` as a DELTA-encoded record —
        the files the commit adds and removes, with stats for the added
        files only; record size is O(changed files), never O(table).
        Mutating callers pin ``version`` when they read the previous
        snapshot (``None`` recomputes from the current log — only for
        direct sequential use in tests). For real commits the version
        is deliberately NOT recomputed from the log here: a writer
        whose snapshot went stale mid-build would otherwise link a
        higher version built from old files — a silent lost update
        instead of the :class:`ConcurrentCommitError` the protocol
        promises.

        ``txn`` (built by :meth:`_txn`) declares the transaction's READ
        SET; with it, losing the version race triggers Delta's
        commit-retry protocol instead of an immediate error: each
        winning commit is checked for a LOGICAL conflict
        (:meth:`_check_txn_conflict`) and, when all are compatible —
        e.g. blind appends racing each other, or a compaction racing an
        append — the same delta record is re-attempted at the next
        version. A real conflict raises the matching typed subclass of
        :class:`ConcurrentCommitError`."""
        import time as _time

        os.makedirs(self.log_dir, exist_ok=True)
        if version is None:
            version = self.versions()[-1] + 1 if self.versions() else 0
        record = {
            "version": version,
            "op": op,
            "add": sorted(add),
            "remove": sorted(remove),
            "schema": schema_json,
            # wall-clock commit instant, for timestamp time travel
            # (Delta's timestampAsOf); injectable for deterministic tests
            "committed_at": (
                _time.time() if committed_at is None else committed_at
            ),
        }
        if epoch is not None:
            if app_id is None:
                record["epoch"] = epoch
            else:
                # Delta's separate txn action, deliberately NOT the
                # shared "epoch" key: a legacy writer's idempotence
                # probe reads record["epoch"] BEFORE any feature gate
                # runs, so a namespaced epoch stored there could alias
                # a legacy writer's bare epoch and silently skip its
                # batch — the exact hazard this namespacing closes.
                # Under a distinct key, legacy probes simply never see
                # namespaced epochs.
                record["app_epoch"] = {"app_id": app_id, "epoch": epoch}
        if constraints:
            record["constraints"] = constraints
        if stats:
            # only bounds for files this commit actually adds
            kept = {f: stats[f] for f in record["add"] if f in stats}
            if kept:
                record["stats"] = kept
        if metrics:
            record["metrics"] = metrics
        if dv:
            # deletion-vector sidecar refs for this commit only (union
            # semantics in resolution): {data file rel: [sidecar rels]}
            record["dv"] = {f: sorted(s) for f, s in dv.items() if s}
        # protocol: declare the features this record's content USES
        # (Delta's table features). Absent on plain commits, so legacy
        # logs and feature-free tables carry zero overhead; resolution
        # accumulates the union and readers/writers gate on it.
        reader_req, writer_req = set(), set()
        if record.get("dv"):
            reader_req |= {"deletion-vectors", "rle-deletion-vectors"}
        if constraints:
            writer_req.add("check-constraints")
        if epoch is not None:
            writer_req.add("txn-epochs")
            if app_id is not None:
                # a writer keying idempotence on the BARE epoch integer
                # would treat this record's namespaced epoch as its own
                # and silently skip a batch — gate it out
                writer_req.add("txn-app-ids")
        # the substring probe is a cheap pre-filter; the json parse
        # confirms the key sits in FIELD METADATA (where this engine
        # puts it), not in some user string literal
        if _PHYSICAL_KEY in schema_json and _mapping_active(
            T.StructType.fromJson(json.loads(schema_json))
        ):
            reader_req.add("column-mapping")
            writer_req.add("column-mapping")
        if features:
            # ops whose requirement is not derivable from record
            # content (type widening: the narrow files look normal,
            # only the schema knows) declare theirs explicitly
            reader_req.update(features.get("reader", ()))
            writer_req.update(features.get("writer", ()))
        if reader_req or writer_req:
            record["protocol"] = {
                "reader": sorted(reader_req),
                "writer": sorted(writer_req),
            }
        # the commit point — optimistic concurrency, Delta's protocol:
        # version N's record may be created exactly once. With a ``txn``
        # read-set a losing writer REBASES automatically: it replays the
        # winning commits through _check_txn_conflict and, when none
        # logically conflicts, re-attempts the SAME delta record at the
        # next version (Delta's commit-retry loop). Without ``txn`` the
        # loss surfaces as ConcurrentCommitError exactly as before.
        if epoch is not None:
            # close the epoch TOCTOU window: the CALLER's idempotence
            # probe ran before it read its base snapshot, so a
            # same-epoch commit landing between that probe and here
            # would make our put_if_absent target a FRESH version and
            # succeed — double-landing the batch. Re-scanning the log
            # immediately before the commit point means the check and
            # the claimed version cover the same log prefix (Delta
            # reads txn versions from the snapshot itself for exactly
            # this reason). Our just-written data files are orphans;
            # vacuum's grace-period sweep reclaims them.
            w = self._epoch_version(epoch, app_id)
            if w is not None:
                return w
        checked_upto = version - 1
        rebases = 0
        while True:
            record["version"] = version
            target = os.path.join(self.log_dir, f"{version:08d}.json")
            if self.log_store.put_if_absent(target, json.dumps(record)):
                break
            winners = [v for v in self.versions() if v > checked_upto]
            if epoch is not None:
                # idempotence beats rebase AND beats the txn-less raise:
                # another writer landing THIS batch (same epoch id, e.g.
                # two retries of one streaming micro-batch — including
                # the GENESIS race where both writers target version 0)
                # means our work is already durable; return its version.
                # Our just-written data files are unreferenced and
                # vacuum's orphan sweep reclaims them.
                for w in winners:
                    if _rec_epoch_key(self._commit_record(w)) == (
                        app_id, epoch
                    ):
                        self._epoch_versions[(app_id, epoch)] = w
                        return w
            if txn is None:
                raise ConcurrentCommitError(
                    f"{self.path}: version {version} was committed by "
                    f"another writer; re-read the log and retry"
                )
            rebases += 1
            if rebases > _MAX_COMMIT_REBASES:
                raise ConcurrentCommitError(
                    f"{self.path}: gave up after {rebases} rebase "
                    f"attempts — a hot writer keeps winning the log race"
                )
            for w in winners:
                self._check_txn_conflict(txn, record, self._commit_record(w))
            checked_upto = max(winners) if winners else checked_upto
            version = checked_upto + 1
        if epoch is not None:
            # register in the idempotence map directly — the writer's
            # own commit never needs a log re-read to be remembered
            self._epoch_versions[(app_id, epoch)] = version
        # periodic checkpoint AFTER the commit lands: derived data, so a
        # crash here loses nothing (resolution anchors one earlier) —
        # and a FAILURE here must not fail the already-durable commit:
        # a retrying caller would double-land its batch (Delta likewise
        # treats post-commit checkpointing as best-effort)
        if version > 0 and version % self.checkpoint_interval == 0:
            try:
                self._write_checkpoint(version)
            except Exception as exc:  # noqa: BLE001 - derived artifact
                self._last_checkpoint_error = exc
        return version

    def _txn(
        self,
        prev: dict | None,
        *,
        read_files=(),
        reads_all: bool = False,
        read_predicate: str | None = None,
        conflict_on_add: bool = False,
    ) -> dict:
        """Declare a transaction's read set for :meth:`_commit`'s
        rebase protocol. ``read_files`` are the snapshot files the
        outcome was computed FROM (a winner removing or re-masking one
        invalidates us); ``reads_all`` marks full-state dependence
        (OVERWRITE/RESTORE — any concurrent change conflicts);
        ``read_predicate`` lets a winner's adds conflict only when
        their stats say rows could match (DELETE); ``conflict_on_add``
        makes EVERY winner add conflict (MERGE — matched keys cannot
        be expressed as one conjunctive predicate).

        Doubling as every mutator's chokepoint, this is also where the
        WRITER-feature gate lives: committing onto a table that
        requires a writer feature this engine lacks could break an
        invariant the unknown feature maintains."""
        unknown_w = set(
            ((prev or {}).get("protocol") or {}).get("writer", ())
        ) - _WRITER_FEATURES
        if unknown_w:
            raise TableFeatureError(
                f"{self.path}: table requires writer feature(s) "
                f"{sorted(unknown_w)} this engine does not implement; "
                f"writing anyway could break them — upgrade the engine"
            )
        schema_json = prev["schema"] if prev else None
        stat_cols = None
        rename = None
        if schema_json is not None:
            base = T.StructType.fromJson(json.loads(schema_json))
            stat_cols = set(_stat_columns(base))
            rename = _physical_names(base)
        return {
            "base_schema": schema_json,
            "base_constraints": dict((prev or {}).get("constraints") or {}),
            "read_files": frozenset(read_files),
            "reads_all": reads_all,
            "read_predicate": read_predicate,
            "conflict_on_add": conflict_on_add,
            "stat_cols": stat_cols,
            # logical->physical map of the base schema: a winner's adds
            # carry physical-keyed stats, and rebase is only reached
            # when the winner's schema EQUALS the base (metadata
            # changes raise first), so the base map is the right one
            "rename": rename,
        }

    def _check_txn_conflict(
        self, txn: dict, record: dict, wrec: dict
    ) -> None:
        """Raise the typed conflict if the winning commit ``wrec``
        logically invalidates this transaction (read set ``txn``, our
        pending delta ``record``); return silently when a rebase is
        sound. The rules are Delta's Serializable conflict matrix:

        - winner changed schema/constraints        -> MetadataChanged
        - winner removed a file we also remove     -> DeleteDelete
        - winner removed/re-masked a file we read  -> DeleteRead
        - winner added rows we should have seen
          (reads_all, conflict_on_add, or stats say
          the add may match read_predicate)        -> ConcurrentAppend

        A winner's adds are judged against ``read_predicate`` with the
        winner's OWN per-file stats via :func:`prune_candidate_files` —
        the same tri-valued, sound-by-construction evaluator the
        DELETE used to pick its candidates, so a stats-provably
        disjoint concurrent append rebases instead of failing."""
        wv = wrec.get("version")
        where = f"{self.path}: concurrent commit {wv}"
        # a winner whose record declares protocol features THIS engine
        # lacks closes the gate the pre-commit check enforced against
        # the (now stale) base snapshot: rebasing past it would write
        # onto a table whose invariants we cannot maintain — exactly
        # what a direct retry from a fresh snapshot would refuse
        wproto = wrec.get("protocol") or {}
        unknown = (
            set(wproto.get("writer", ())) - _WRITER_FEATURES
        ) | (set(wproto.get("reader", ())) - _READER_FEATURES)
        if unknown:
            raise TableFeatureError(
                f"{where} requires feature(s) {sorted(unknown)} this "
                f"engine does not implement; refusing to rebase onto it"
            )
        if "files" in wrec:
            # legacy full-snapshot record = an overwrite of everything:
            # only a blind append can rebase across it
            if (
                txn["reads_all"]
                or txn["read_files"]
                or record.get("remove")
                or txn["conflict_on_add"]
                or txn["read_predicate"] is not None
            ):
                raise ConcurrentDeleteReadError(
                    f"{where} replaced the whole table (full-snapshot "
                    f"record) under this transaction"
                )
            if txn["base_schema"] is not None and (
                wrec.get("schema") != txn["base_schema"]
            ):
                raise MetadataChangedError(
                    f"{where} changed the table schema under this "
                    f"transaction"
                )
            if txn["base_schema"] is not None and (
                (wrec.get("constraints") or {}) != txn["base_constraints"]
            ):
                raise MetadataChangedError(
                    f"{where} changed the CHECK constraints under this "
                    f"transaction (full-snapshot record)"
                )
            return
        if txn["base_schema"] is not None:
            if wrec.get("schema") != txn["base_schema"]:
                raise MetadataChangedError(
                    f"{where} changed the table schema under this "
                    f"transaction; retry from a fresh snapshot"
                )
            if (wrec.get("constraints") or {}) != txn["base_constraints"]:
                raise MetadataChangedError(
                    f"{where} changed the CHECK constraints under this "
                    f"transaction; retry from a fresh snapshot"
                )
        w_removed = set(wrec.get("remove") or ())
        ours_removed = set(record.get("remove") or ())
        both = w_removed & ours_removed
        if both:
            raise ConcurrentDeleteDeleteError(
                f"{where} removed {sorted(both)[:3]} which this "
                f"transaction also removes"
            )
        read_hit = w_removed & txn["read_files"]
        if read_hit:
            raise ConcurrentDeleteReadError(
                f"{where} removed {sorted(read_hit)[:3]} which this "
                f"transaction read"
            )
        w_masked = set(wrec.get("dv") or {})
        mask_hit = w_masked & (txn["read_files"] | ours_removed)
        if mask_hit:
            raise ConcurrentDeleteReadError(
                f"{where} re-masked (deletion vector) "
                f"{sorted(mask_hit)[:3]} which this transaction read"
            )
        w_added = list(wrec.get("add") or ())
        if txn["reads_all"] and (w_added or w_removed or w_masked):
            if w_added:
                raise ConcurrentAppendError(
                    f"{where} added {len(w_added)} file(s) to table "
                    f"state this transaction replaces"
                )
            raise ConcurrentDeleteReadError(
                f"{where} changed table state this transaction replaces"
            )
        if w_added and txn["conflict_on_add"]:
            raise ConcurrentAppendError(
                f"{where} added {len(w_added)} file(s) that may hold "
                f"keys this transaction matched on"
            )
        if w_added and txn["read_predicate"] is not None:
            may_match = prune_candidate_files(
                w_added,
                wrec.get("stats") or {},
                txn["read_predicate"],
                stat_cols=txn["stat_cols"],
                rename=txn["rename"],
            )
            if may_match:
                raise ConcurrentAppendError(
                    f"{where} added file(s) {may_match[:3]} whose stats "
                    f"admit rows matching this transaction's predicate "
                    f"{txn['read_predicate']!r}"
                )

    def protocol(self) -> dict:
        """Accumulated protocol features the latest version requires:
        ``{"reader": [...], "writer": [...]}`` (empty when the log
        never used a gated feature) — Delta's table-features surface.
        Derived from commit content, monotone over history."""
        if not self.versions():
            return {}
        return dict(
            self._manifest(self.latest_version()).get("protocol") or {}
        )

    def constraints(self) -> dict:
        """Active CHECK constraints (name -> SQL boolean expression) at
        the latest version — Delta's table-level CHECK constraints,
        carried forward manifest-to-manifest like the schema."""
        if not self.versions():
            return {}
        return dict(
            self._manifest(self.latest_version()).get("constraints") or {}
        )

    def _enforce(self, df: DataFrame, constraints: dict) -> None:
        """Refuse a batch whose rows violate any CHECK constraint.

        SQL CHECK semantics (Delta's too): a row violates only when the
        expression is FALSE — NULL/unknown passes. ALL constraints are
        probed in ONE Spark job: a single projection computes every
        violation flag, one ``limit(1)`` finds any violating row (early
        exit), and the flags on that row name the violated constraint —
        k constraints never cost k job launches."""
        if not constraints:
            return
        names = sorted(constraints)
        flags = [
            (
                F.expr(constraints[n]).cast("boolean") == F.lit(False)
            ).alias(f"__viol{i}")
            for i, n in enumerate(names)
        ]
        probe = df.select(*flags)
        cond = F.col("__viol0")
        for i in range(1, len(names)):
            cond = cond | F.col(f"__viol{i}")
        bad = probe.filter(cond).limit(1).collect()
        if bad:
            row = bad[0]
            name = next(
                n for i, n in enumerate(names) if row[f"__viol{i}"]
            )
            raise ConstraintViolationError(
                f"{self.path}: batch violates CHECK constraint "
                f"{name!r} ({constraints[name]}); commit refused, "
                f"table unchanged"
            )

    def add_constraint(self, name: str, expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT ... CHECK (expr) — validates the
        EXISTING table satisfies the constraint (one scan, exactly as
        Delta does), then commits a zero-IO ``set_constraint`` version
        carrying the files forward by name. Every subsequent
        overwrite/append/merge batch is checked against it."""
        if not _TAG_RE.fullmatch(name):
            raise ValueError(f"invalid constraint name {name!r}")
        prev = self._manifest(self.latest_version())
        hint = prev["version"] + 1
        cons = dict(prev.get("constraints") or {})
        if name in cons:
            raise ValueError(
                f"{self.path}: constraint {name!r} already exists "
                f"({cons[name]}); drop it first"
            )
        self._enforce(self.read(), {name: expr})
        cons[name] = expr
        # pure bookkeeping commit: zero files change hands — O(1) record.
        # conflict_on_add: a batch landing between our validation scan
        # and the commit was never checked against the new constraint
        return self._commit(
            "set_constraint", schema_json=prev["schema"],
            version=hint, constraints=cons,
            txn=self._txn(prev, conflict_on_add=True),
        )

    def drop_constraint(self, name: str) -> int:
        """ALTER TABLE DROP CONSTRAINT — zero-IO bookkeeping commit."""
        prev = self._manifest(self.latest_version())
        hint = prev["version"] + 1
        cons = dict(prev.get("constraints") or {})
        if name not in cons:
            raise ValueError(f"{self.path}: no constraint {name!r}")
        del cons[name]
        # relaxing a constraint invalidates no concurrent writer's work:
        # rebases over anything except another metadata change
        return self._commit(
            "drop_constraint", schema_json=prev["schema"],
            version=hint, constraints=cons,
            txn=self._txn(prev),
        )

    # -- column mapping (rename / drop) --------------------------------------

    @staticmethod
    def _constraints_referencing(cons: dict, column: str) -> list[str]:
        """Constraint names whose expression mentions ``column`` as an
        identifier (word-boundary or backtick-quoted) — conservative:
        a hit inside a string literal also counts, because silently
        keeping a constraint that no longer binds would be worse than
        asking the user to drop and re-add it. CASE-INSENSITIVE, like
        Spark's own column resolution: a constraint written
        ``O_TOTALPRICE > 0`` binds the column ``o_totalprice`` and must
        be detected on its rename (the rewriter then fails closed on
        case-variant occurrences it cannot soundly rewrite)."""
        pat = re.compile(
            rf"(?<![A-Za-z0-9_]){re.escape(column)}(?![A-Za-z0-9_])",
            re.IGNORECASE,
        )
        return sorted(n for n, e in cons.items() if pat.search(e))

    @staticmethod
    def _rewrite_constraint_expr(
        expr: str, old: str, new: str
    ) -> str | None:
        """``expr`` with column REFERENCES to ``old`` renamed ``new``
        (Delta rewrites constraint expressions under column mapping the
        same way), or None when the rewrite cannot be proven sound —
        the caller then fails closed exactly as before.

        A single lexer pass distinguishes the contexts a regex cannot:
        string literals ('...' / \"...\", '' escapes) are left verbatim
        (they are values, not references); backtick-quoted identifiers
        rewrite by exact content; bare identifiers rewrite on word
        boundary EXCEPT struct-member accesses (``s.old`` names a field
        of ``s``, not the column) and function calls (``old(...)``
        names a function). Unsound cases returning None: the expression
        contains a lambda (``->`` — an occurrence of ``old`` inside may
        be the lambda's bound variable, not the column), already uses
        ``new`` as an identifier in ANY case (Spark resolves columns
        case-insensitively, so a case-variant capture is still a
        capture), or references ``old`` in a case VARIANT (it binds the
        column under Spark's resolution, but rewriting it would change
        the text the user wrote beyond the mechanical rename — fail
        closed, drop and re-add by hand)."""
        out: list[str] = []
        i, n = 0, len(expr)
        prev_sig = ""  # last non-space char emitted, for the '.' test
        if "->" in expr:
            return None
        while i < n:
            ch = expr[i]
            if ch == "'" or ch == '"':
                j = i + 1
                while j < n:
                    if expr[j] == "\\":
                        j += 2  # backslash escape (Spark SQL literals)
                        continue
                    if expr[j] == ch:
                        if ch == "'" and j + 1 < n and expr[j + 1] == "'":
                            j += 2  # '' escape
                            continue
                        break
                    j += 1
                if j >= n:
                    return None  # unterminated literal: refuse
                out.append(expr[i:j + 1])
                i = j + 1
                prev_sig = ch
                continue
            if ch == "`":
                j = expr.find("`", i + 1)
                if j < 0:
                    return None  # unterminated quote: refuse
                ident = expr[i + 1:j]
                if ident.lower() == new.lower():
                    return None  # capture hazard (any case)
                if prev_sig != "." and ident.lower() == old.lower():
                    if ident != old:
                        return None  # case-variant reference: refuse
                    out.append(f"`{new}`")
                else:
                    out.append(expr[i:j + 1])
                i = j + 1
                prev_sig = "`"
                continue
            if ch.isalpha() or ch == "_":
                j = i
                while j < n and (expr[j].isalnum() or expr[j] == "_"):
                    j += 1
                word = expr[i:j]
                k = j
                while k < n and expr[k].isspace():
                    k += 1
                is_call = k < n and expr[k] == "("
                if word.lower() == new.lower() and prev_sig != ".":
                    return None  # capture hazard (any case)
                if (
                    word.lower() == old.lower()
                    and prev_sig != "."
                    and not is_call
                ):
                    if word != old:
                        return None  # case-variant reference: refuse
                    out.append(new)
                else:
                    out.append(word)
                i = j
                prev_sig = word[-1]
                continue
            out.append(ch)
            if not ch.isspace():
                prev_sig = ch
            i += 1
        return "".join(out)

    def _activate_mapping(
        self, schema: T.StructType, drop: str | None = None,
        rename: tuple | None = None,
    ) -> T.StructType:
        """The schema with column mapping ACTIVE: every surviving field
        carries a ``physical_name`` frozen to its current physical
        (first activation freezes the on-disk names as they are —
        existing files need no rewrite), with ``drop`` removed and
        ``rename=(old, new)`` applied to logical names only."""
        fields = []
        for f in schema.fields:
            if drop is not None and f.name == drop:
                continue
            md = dict(f.metadata or {})
            md.setdefault(_PHYSICAL_KEY, f.name)
            name = f.name
            if rename is not None and f.name == rename[0]:
                name = rename[1]
            fields.append(T.StructField(name, f.dataType, f.nullable, md))
        return T.StructType(fields)

    def rename_column(self, old: str, new: str) -> int:
        """ALTER TABLE RENAME COLUMN — a zero-IO metadata commit,
        Delta column mapping's NAME mode (the public design this
        implements; the reference's stage tables are Delta,
        ``light_transform.py:1363-1392``): the field's stable
        ``physical_name`` keeps pointing at the bytes every existing
        file already holds, only the LOGICAL name users query changes.
        Old versions time-travel under their own schema (pre-rename
        reads still say ``old``); per-file stats stay valid because
        they are keyed by physical name; new writes land under the
        same physical name. The commit requires the ``column-mapping``
        reader+writer features, so a pre-mapping engine fails closed
        instead of mis-reading physical files.

        CHECK constraints referencing the old name are REWRITTEN to
        the new name in the same commit (Delta rewrites constraint
        expressions under column mapping) — the constraint keeps
        enforcing across the rename with zero user action; per-file
        stats stay keyed by untouched physical names. Expressions the
        rewriter cannot prove sound (lambdas, where an occurrence may
        be a bound variable; expressions already using the new name as
        an identifier) raise instead — drop and re-add those by hand.
        Active Z-order metadata is left as-is: a clustering anchor
        naming the old column simply stops matching, so the next
        ``compact(zorder_by=[new])`` does a full (correct,
        conservative) re-cluster."""
        prev = self._manifest(self.latest_version())
        schema = T.StructType.fromJson(json.loads(prev["schema"]))
        names = schema.fieldNames()
        if old not in names:
            raise ValueError(
                f"{self.path}: no column {old!r} (have {names})"
            )
        if new in names:
            raise ValueError(
                f"{self.path}: column {new!r} already exists"
            )
        if not _COLNAME_RE.fullmatch(new):
            raise ValueError(
                f"{self.path}: invalid column name {new!r}"
            )
        cons = dict(prev.get("constraints") or {})
        for cname in self._constraints_referencing(cons, old):
            rewritten = self._rewrite_constraint_expr(cons[cname], old, new)
            if rewritten is None:
                raise ValueError(
                    f"{self.path}: CHECK constraint {cname!r} "
                    f"({cons[cname]!r}) references column {old!r} in a "
                    f"form the rewriter cannot prove sound; drop it "
                    f"first and re-add under the new name"
                )
            try:
                F.expr(rewritten)  # must still parse post-rewrite
            except Exception as exc:
                raise ValueError(
                    f"{self.path}: rewriting CHECK constraint "
                    f"{cname!r} for the rename produced an unparsable "
                    f"expression {rewritten!r}; drop it first and "
                    f"re-add under the new name"
                ) from exc
            cons[cname] = rewritten
        new_schema = self._activate_mapping(schema, rename=(old, new))
        return self._commit(
            "rename_column", schema_json=new_schema.json(),
            version=prev["version"] + 1, constraints=cons,
            metrics={"renamed": [old, new]},
            # a metadata change: concurrent writers' rebases raise
            # MetadataChanged against it; our own commit rebases over
            # data-only winners (their files keep their physical names)
            txn=self._txn(prev),
        )

    def drop_column(self, name: str) -> int:
        """ALTER TABLE DROP COLUMN — zero-IO metadata commit (Delta
        column mapping's drop): the field leaves the logical schema,
        its bytes stay in existing files, scans simply never select
        its physical column. Re-adding the same LOGICAL name later
        (``append(merge_schema=True)``) mints a fresh physical name,
        so the dropped bytes can never resurrect — the exact hazard
        Delta's uuid physical names exist to prevent. Dropping the
        last column, or a column a CHECK constraint references,
        raises."""
        prev = self._manifest(self.latest_version())
        schema = T.StructType.fromJson(json.loads(prev["schema"]))
        names = schema.fieldNames()
        if name not in names:
            raise ValueError(
                f"{self.path}: no column {name!r} (have {names})"
            )
        if len(names) == 1:
            raise ValueError(
                f"{self.path}: cannot drop the table's only column"
            )
        cons = dict(prev.get("constraints") or {})
        hit = self._constraints_referencing(cons, name)
        if hit:
            raise ValueError(
                f"{self.path}: CHECK constraint(s) {hit} reference "
                f"column {name!r}; drop them first"
            )
        new_schema = self._activate_mapping(schema, drop=name)
        return self._commit(
            "drop_column", schema_json=new_schema.json(),
            version=prev["version"] + 1, constraints=cons,
            metrics={"dropped": name},
            txn=self._txn(prev),
        )

    def widen_column(self, name: str, new_type) -> int:
        """ALTER TABLE ALTER COLUMN ... TYPE — Delta's type-widening
        feature: a ZERO-IO metadata commit replacing the column's type
        with a lossless wider one (:func:`_widens` — integer chain,
        float->double, small-int->double, integer->decimal). Existing
        files keep their narrow parquet encoding; every scan reads them
        under the wider schema (Spark's parquet reader upcasts
        natively), new batches land wide, and narrower batches remain
        appendable forever (reads widen them too). Values are
        preserved exactly, so CHECK constraints keep binding. Old
        versions time-travel under their own (narrow) schema. The
        commit requires the ``type-widening`` reader+writer features —
        an engine that would mis-read narrow files under a wide schema
        fails closed instead. ``new_type`` is a DataType or a DDL
        string (``"bigint"``, ``"decimal(20,0)"``)."""
        if isinstance(new_type, str):
            new_type = T.StructType.fromDDL(
                f"__w {new_type}"
            ).fields[0].dataType
        prev = self._manifest(self.latest_version())
        schema = T.StructType.fromJson(json.loads(prev["schema"]))
        names = schema.fieldNames()
        if name not in names:
            raise ValueError(
                f"{self.path}: no column {name!r} (have {names})"
            )
        old = schema[name].dataType
        if old == new_type:
            return prev["version"]
        if not _widens(old, new_type):
            raise ValueError(
                f"{self.path}: {old.simpleString()} -> "
                f"{new_type.simpleString()} is not a supported lossless "
                f"widening for column {name!r} (integer chain, "
                f"float->double, byte/short/int->double, "
                f"integer->decimal)"
            )
        fields = [
            T.StructField(
                f.name,
                new_type if f.name == name else f.dataType,
                f.nullable,
                f.metadata,
            )
            for f in schema.fields
        ]
        return self._commit(
            "widen_column", schema_json=T.StructType(fields).json(),
            version=prev["version"] + 1,
            constraints=dict(prev.get("constraints") or {}),
            metrics={
                "widened": [
                    name, old.simpleString(), new_type.simpleString()
                ]
            },
            features={
                "reader": ["type-widening"],
                "writer": ["type-widening"],
            },
            txn=self._txn(prev),
        )

    # -- named refs (tags) ---------------------------------------------------

    @property
    def refs_dir(self) -> str:
        return os.path.join(self.log_dir, "refs")

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a NAME to a version — Iceberg's tags (named snapshot
        refs; Delta approximates with a timestamp bookmark). Tags are
        mutable refs: re-tagging replaces atomically (``os.replace``).
        A tagged version survives :meth:`vacuum` regardless of the
        retention count — exactly Iceberg's tag-retention rule — so
        ``tag('audit-2024q4', v)`` is a durable, named time-travel
        anchor while untagged history ages out."""
        if not _TAG_RE.fullmatch(name):
            raise ValueError(f"invalid tag name {name!r}")
        if version is None:
            version = self.latest_version()
        self._manifest(version)  # must exist
        os.makedirs(self.refs_dir, exist_ok=True)
        tmp = os.path.join(
            self.refs_dir, f".tmp-{uuid.uuid4().hex[:8]}.json"
        )
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"version": version}, fh)
        os.replace(tmp, os.path.join(self.refs_dir, f"{name}.json"))
        return version

    def tags(self) -> dict:
        """All named refs as {tag_name: version}."""
        if not os.path.isdir(self.refs_dir):
            return {}
        out = {}
        for f in sorted(os.listdir(self.refs_dir)):
            if not f.endswith(".json") or f.startswith("."):
                continue
            with open(os.path.join(self.refs_dir, f), encoding="utf-8") as fh:
                out[f[:-5]] = json.load(fh)["version"]
        return out

    def untag(self, name: str) -> None:
        p = os.path.join(self.refs_dir, f"{name}.json")
        if not os.path.exists(p):
            raise VersionNotFoundError(f"{self.path}: no tag {name!r}")
        os.remove(p)

    def history(self) -> list[dict]:
        """Version, op, file count, and (for DELETE/MERGE) the pruning
        metrics per commit — Delta's DESCRIBE HISTORY with
        operationMetrics. File counts accumulate incrementally over the
        delta records (one small JSON read per commit); only a chain
        gap (post-vacuum) or a legacy snapshot record pays a full
        resolution."""
        out: list[dict] = []
        n: int | None = None
        prev_v: int | None = None
        for v in self.versions():
            rec = self._commit_record(v)
            if "files" in rec:
                n = len(rec["files"])
            elif n is None or (prev_v is not None and v != prev_v + 1):
                n = len(self._manifest(v)["files"])
            else:
                n = n - len(rec.get("remove") or ()) + len(
                    rec.get("add") or ()
                )
            entry = {"version": v, "op": rec["op"], "n_files": n}
            if "metrics" in rec:
                entry["metrics"] = rec["metrics"]
            out.append(entry)
            prev_v = v
        return out

    # -- data IO -----------------------------------------------------------

    def _footer_stats(
        self,
        out: dict,
        rels: list[str],
        footer_cols: list[str],
        by_name: dict,
    ) -> bool:
        """Fill ``out`` with [min, max] bounds for ``footer_cols`` read
        straight from the parquet footers — no Spark job. Returns False
        (caller falls back to the Spark scan, ``out`` reset) when
        pyarrow is unavailable or any footer is unreadable.

        Soundness: parquet footer min/max are VALID bounds even when
        the writer truncated them (truncated max gets its last byte
        incremented to stay an upper bound), and every pruning rule
        needs only validity, not exactness. UTF-8 byte order equals
        code-point order, so string footer bounds compare consistently
        with Spark/Python semantics. A row group without usable stats
        degrades that column to [None, None] (unknown — never pruned
        on), EXCEPT the all-NULL case, which contributes nothing by the
        same rule Spark's min/max use.

        Float/double columns (r14): this engine only ever collects
        stats for files IT just wrote, and Spark's parquet writer
        emits NaN-GREATEST chunk stats (a chunk containing NaN carries
        max=NaN; an all-NaN chunk carries min=max=NaN — pinned by
        test_footer_stats_float_nan_poisons_upper_bound against the
        bundled writer). A NaN max therefore marks the chunk, and the
        file's upper bound degrades to None (unknown) exactly like the
        Spark scan's ``_stat_value(NaN)`` did; an all-NaN chunk
        contributes no finite values, like an all-NULL one. This moved
        float stats off a per-commit Spark re-scan of every written
        file and onto the same footer walk ints/strings use."""
        if not footer_cols:
            return True
        try:
            import pyarrow.parquet as pq
        except Exception:  # pragma: no cover - pyarrow is baked in
            return False
        cap = 64
        try:
            for rel in rels:
                md = pq.ParquetFile(self._abs(rel)).metadata
                if md.num_rows == 0:
                    out[rel] = {}
                    continue
                bounds = {c: [None, None, True] for c in footer_cols}
                # [lo, hi, empty_so_far]
                nan_hi: set[str] = set()  # float cols with a NaN chunk
                for rg_i in range(md.num_row_groups):
                    rg = md.row_group(rg_i)
                    seen = set()
                    for ci in range(rg.num_columns):
                        cc = rg.column(ci)
                        name = cc.path_in_schema
                        if name not in bounds:
                            continue
                        seen.add(name)
                        b = bounds[name]
                        st = cc.statistics
                        if st is None:
                            b[0] = b[1] = None
                            b[2] = False
                            continue
                        if not st.has_min_max:
                            # all-NULL chunk: ColumnChunkMetaData's
                            # num_values INCLUDES nulls, so all-NULL is
                            # null_count == num_values (equivalently:
                            # zero non-null values). Such a chunk
                            # contributes no values — skip it so the
                            # file's OTHER row groups still yield
                            # bounds, exactly like Spark's min/max
                            # ignoring NULLs.
                            if (
                                st.has_null_count
                                and st.null_count == cc.num_values
                            ) or st.num_values == 0:
                                continue
                            b[0] = b[1] = None
                            b[2] = False
                            continue
                        lo, hi = st.min, st.max
                        if isinstance(lo, bytes) or isinstance(hi, bytes):
                            # undecoded binary: don't guess an ordering
                            b[0] = b[1] = None
                            b[2] = False
                            continue
                        if isinstance(
                            by_name[name], (T.FloatType, T.DoubleType)
                        ) and (
                            (hi is not None and math.isnan(hi))
                            or (lo is not None and math.isnan(lo))
                        ):
                            # NaN-greatest writer stats: max=NaN marks a
                            # NaN-bearing chunk — the file's upper bound
                            # is unknowable (Spark's max would be NaN).
                            nan_hi.add(name)
                            if lo is not None and math.isnan(lo):
                                # all-NaN chunk: no finite values —
                                # contributes nothing, like all-NULL
                                continue
                            hi = None
                        if b[2]:
                            b[0], b[1], b[2] = lo, hi, False
                        else:
                            if b[0] is not None and lo is not None:
                                b[0] = min(b[0], lo)
                            else:
                                b[0] = None
                            if b[1] is not None and hi is not None:
                                b[1] = max(b[1], hi)
                            else:
                                b[1] = None
                    missing = set(footer_cols) - seen
                    for name in missing:
                        # column absent from the row group footer:
                        # bounds unknowable from here
                        bounds[name] = [None, None, False]
                st_out = {}
                for c in nan_hi:
                    # sticky across chunk order: a clean later chunk
                    # must not resurrect an upper bound a NaN chunk
                    # already invalidated
                    bounds[c][1] = None
                for c, (lo, hi, empty) in bounds.items():
                    # empty==True means every chunk was all-NULL: bounds
                    # stay unknown (matches the Spark scan: min/max of
                    # all-NULL is NULL)
                    if isinstance(by_name[c], T.StringType):
                        if lo is not None and len(lo) > cap:
                            lo = lo[:cap]
                        if hi is not None and len(hi) > cap:
                            hi = None
                    st_out[c] = [lo, hi]
                out[rel] = st_out
        except (OSError, ValueError, KeyError):
            for rel in rels:
                out[rel] = {}
            return False
        return True

    def _collect_stats(self, rels: list[str], schema_json: str) -> dict:
        """Per-file [min, max] bounds for the stat-supported columns of
        the NEW files ``rels``. ALL bounds come from the parquet
        FOOTERS (milliseconds per file, no Spark job — Delta likewise
        reads stats off the write path). Float/double joined the
        footer path in r14: the bundled Spark writer emits NaN-greatest
        chunk stats, so a NaN chunk is detectable from the footer and
        the upper bound degrades to None exactly as the old per-commit
        Spark re-scan's ``_stat_value(NaN)`` did (soundness note at
        :meth:`_footer_stats`); the Spark scan survives only as the
        fallback for unreadable footers / missing pyarrow. Files whose
        footer shows zero rows keep an empty dict — by convention
        "provably empty", prunable under stat_cols."""
        out: dict = {r: {} for r in rels}
        if not rels:
            return out
        # stats are keyed by PHYSICAL column name: that is what the
        # files contain, and it is what keeps every already-committed
        # bound valid across renames (a rename is zero-IO — rewriting
        # stats would defeat it). Pruning translates logical
        # predicates through the mapping at lookup time.
        schema = _physical_schema(
            T.StructType.fromJson(json.loads(schema_json))
        )
        cols = _stat_columns(schema)
        if not cols:
            return out
        by_name_all = {f.name: f.dataType for f in schema.fields}
        footer_ok = self._footer_stats(out, rels, cols, by_name_all)
        if footer_ok:
            return out
        # pyarrow unavailable / unreadable footer: everything falls
        # back to the Spark scan
        df = self.spark.read.schema(schema).parquet(
            *[self._abs(r) for r in rels]
        )
        # String bounds are TRUNCATED to keep manifests KB-scale with
        # long text columns (Delta truncates string stats the same way):
        # substring to cap+1 chars BEFORE collect so the driver never
        # ships a document-sized value. Soundness: a 64-char PREFIX of
        # the true min is still <= every value (valid lower bound), but
        # a prefix of the true max is < the true max — so a truncated
        # max degrades to None (unknown), never a fake bound.
        cap = 64
        by_name = {f.name: f.dataType for f in schema.fields}
        aggs = []
        for i, c in enumerate(cols):
            mn, mx = F.min(F.col(f"`{c}`")), F.max(F.col(f"`{c}`"))
            if isinstance(by_name[c], T.StringType):
                mn = F.substring(mn, 1, cap + 1)
                mx = F.substring(mx, 1, cap + 1)
            aggs.append(mn.alias(f"__mn{i}"))
            aggs.append(mx.alias(f"__mx{i}"))
        rows = (
            df.withColumn("__f", F.input_file_name())
            .groupBy("__f")
            .agg(*aggs)
            .collect()
        )
        for row in rows:
            rel = self._rel_path(row["__f"])
            if rel not in out:
                # every scanned group MUST map back to a committed file
                # — silently dropping one would leave {} stats for a
                # rows-bearing file, which the stat_cols missing-column
                # rule then wrongly treats as zero-row/prunable
                raise RuntimeError(
                    f"{self.path}: stats group {row['__f']!r} does not "
                    f"map to a committed file (got {rel!r}); refusing "
                    f"to commit unsound empty stats"
                )
            for i, c in enumerate(cols):
                lo = _stat_value(row[f"__mn{i}"])
                hi = _stat_value(row[f"__mx{i}"])
                if isinstance(by_name[c], T.StringType):
                    if lo is not None and len(lo) > cap:
                        lo = lo[:cap]
                    if hi is not None and len(hi) > cap:
                        hi = None
                # merge INTO the footer-collected bounds (the scan here
                # covers only the columns the footers could not)
                out[rel][c] = [lo, hi]
        return out

    def _write_files(
        self,
        df: DataFrame,
        version_hint: int,
        schema: T.StructType | None = None,
    ) -> list[str]:
        """Write ``df`` into a fresh commit subdirectory; return the new
        files as table-relative paths. ``schema`` (the commit's LOGICAL
        schema) routes the batch through column mapping when active:
        columns are aliased to their stable physical names before the
        parquet write, so a post-rename batch lands under the same
        on-disk names as pre-rename files. Unmapped tables (and DV
        sidecars, which pass no schema) write names as-is."""
        if schema is not None and _mapping_active(schema):
            phys = _physical_names(schema)
            if any(phys.get(c, c) != c for c in df.columns):
                df = df.select(
                    *[
                        F.col(f"`{c}`").alias(phys.get(c, c))
                        for c in df.columns
                    ]
                )
        sub = f"c{version_hint:08d}-{uuid.uuid4().hex[:8]}"
        dest = os.path.join(self.data_dir, sub)
        df.write.mode("overwrite").parquet(dest)
        return sorted(
            os.path.join("data", sub, f)
            for f in os.listdir(dest)
            if f.endswith(".parquet")
        )

    def _abs(self, rel: str) -> str:
        return os.path.join(self.path, rel)

    # -- deletion vectors (merge-on-read) ------------------------------------
    #
    # A DV delete never rewrites data: it writes a SIDECAR parquet of
    # (file_name, row_index) pairs and commits a zero-data-IO record
    # whose "dv" field maps each touched data file to the sidecar.
    # Reads apply the mask with one anti-join on Spark's
    # _metadata.file_name/row_index columns; files without a DV keep
    # the clean codegen scan path. This is Delta's deletion-vector
    # design: the COW rewrite (delete(mode="cow")) pays O(matched
    # files) WRITE per delete; the DV path pays O(matched rows) sidecar
    # write now and a small read-side anti-join until OPTIMIZE purges —
    # the only acceptable shape for frequent small takedowns on a
    # 100 TB table. File NAMES key the mask (Spark part files are
    # uuid-unique), so the mask survives table moves.
    #
    # Sidecar ENCODING is run-length (the RLE container of a roaring
    # bitmap): one row per maximal run of consecutive masked positions
    # — (file_name, start, n) — so a contiguous-range takedown of 10^9
    # rows is a HANDFUL of sidecar rows, not 10^9 (sidecar bytes track
    # the mask's run structure, sublinear in deleted rows; Delta's DV
    # files are roaring bitmaps for exactly this reason). Runs are
    # capped at _DV_RUN_CAP positions so decode never materializes an
    # unbounded array in one task. Every consumer goes through
    # :meth:`_dv_sidecar_rows`, which decodes runs back to positions —
    # the anti-join plan above the seam is unchanged.

    _DV_SCHEMA = "file_name string, start long, n long"
    _DV_RUN_CAP = 1 << 18  # max positions decoded per sidecar row

    def _dv_sidecar_runs(self, sidecars: list[str]) -> DataFrame:
        """Raw (file_name, start, n) runs of the given sidecars."""
        return self.spark.read.schema(self._DV_SCHEMA).parquet(
            *[self._abs(s) for s in sorted(set(sidecars))]
        )

    def _dv_sidecar_rows(self, sidecars: list[str]) -> DataFrame:
        """Masked positions as (file_name, row_index) — the decode of
        the run-length sidecar encoding; one sequence-explode per run."""
        return self._dv_sidecar_runs(sidecars).select(
            "file_name",
            F.explode(
                F.sequence(
                    F.col("start"), F.col("start") + F.col("n") - F.lit(1)
                )
            ).alias("row_index"),
        )

    def _encode_dv_runs(self, positions: DataFrame) -> DataFrame:
        """Collapse DISTINCT (file_name, row_index) positions into runs
        — gaps-and-islands: positions sorted within a window get a
        group key of ``row_index - row_number()`` (constant exactly
        along a consecutive run), one groupBy yields (start, n).

        The window partitions by (file_name, ``row_index div
        _DV_RUN_CAP``), NOT by file alone: a 10^9-row takedown on one
        file would otherwise sort the whole victim set in a single
        task (one file = one window partition — the skew AQE cannot
        split, because a window needs its partition whole). Chunking
        bounds every window partition at _DV_RUN_CAP rows, so encode
        parallelism tracks deleted volume, not file count. Runs can
        therefore never cross a cap-aligned boundary — which also
        enforces the decode bound directly (a run is at most one chunk
        long), at the cost of at most one extra sidecar row per cap
        window on a longer takedown: asymptotically the same sidecar
        size the old encode-then-split produced."""
        from pyspark.sql import Window

        cap = F.lit(self._DV_RUN_CAP)
        w = Window.partitionBy("file_name", "__chunk").orderBy(
            "row_index"
        )
        return (
            positions.select("file_name", "row_index")
            .withColumn(
                "__chunk", F.floor(F.col("row_index") / cap).cast("long")
            )
            .withColumn(
                "__grp", F.col("row_index") - F.row_number().over(w)
            )
            .groupBy("file_name", "__chunk", "__grp")
            .agg(
                F.min("row_index").alias("start"),
                F.count(F.lit(1)).alias("n"),
            )
            .select("file_name", "start", "n")
        )

    def _read_physical(
        self,
        rels: list[str],
        schema: T.StructType,
        meta: tuple = (),
    ) -> DataFrame:
        """Parquet scan of data files under the LOGICAL schema: files
        are read by PHYSICAL column name (stable across renames —
        column mapping) and aliased back to the logical names callers
        and plans use. ``meta`` adds ``_metadata`` projections as
        ``(source_field, alias)`` pairs. On an unmapped table this is
        the plain schema'd scan — zero extra plan nodes."""
        phys = _physical_schema(schema)
        r = self.spark.read.schema(phys).parquet(
            *[self._abs(f) for f in rels]
        )
        identity = phys.fieldNames() == schema.fieldNames()
        if identity and not meta:
            return r
        sel = [
            F.col(f"`{p}`").alias(n)
            for p, n in zip(phys.fieldNames(), schema.fieldNames())
        ]
        sel += [F.col(f"_metadata.{m}").alias(a) for m, a in meta]
        return r.select(*sel)

    def _scan(
        self,
        rels: list[str],
        schema: T.StructType,
        dv: dict | None = None,
        *,
        file_col: str | None = None,
    ) -> DataFrame:
        """DV-aware scan of the given data files: files without a
        deletion vector read clean (whole-stage codegen, no metadata
        columns); files with one read _metadata.file_name/row_index and
        anti-join their masked rows out — merge-on-read.

        ``file_col`` additionally projects each row's data-file
        BASENAME (``_metadata.file_name`` — unique per table, Spark
        uuid-names part files). Callers that need per-file bookkeeping
        (COW touched-file detection) use this instead of
        ``input_file_name()``, which cannot bind over the DV arm's
        two-source join."""
        if not rels:
            out = _rows_df(self.spark, [], schema)
            if file_col:
                out = out.withColumn(file_col, F.lit(None).cast("string"))
            return out
        rset = set(rels)
        dv = {f: s for f, s in (dv or {}).items() if f in rset and s}
        clean = [r for r in rels if r not in dv]
        cols = schema.fieldNames()
        parts = []
        if clean:
            c = self._read_physical(
                clean, schema,
                meta=(("file_name", file_col),) if file_col else (),
            )
            parts.append(c)
        if dv:
            masked = self._read_physical(
                sorted(dv), schema,
                meta=(("file_name", "__fn"), ("row_index", "__ri")),
            )
            mask = self._dv_sidecar_rows(
                [s for lst in dv.values() for s in lst]
            ).select(
                F.col("file_name").alias("__fn"),
                F.col("row_index").alias("__ri"),
            )
            joined = masked.join(mask, ["__fn", "__ri"], "left_anti")
            if file_col:
                joined = joined.select(
                    *cols, F.col("__fn").alias(file_col)
                )
            else:
                joined = joined.select(*cols)
            parts.append(joined)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _rels_by_name(self, rels: list[str]) -> dict:
        return {os.path.basename(f): f for f in rels}

    def version_at(self, timestamp: float) -> int:
        """Latest version committed at or before ``timestamp`` (unix
        seconds) — Delta's ``timestampAsOf`` resolution. Raises
        :class:`VersionNotFoundError` when the earliest retained commit
        is newer (identical to Delta: a vacuumed history cannot answer
        for instants before its retention window). Manifests written
        before this field existed sort as 0 (always eligible)."""
        best = None
        for v in self.versions():
            if self._commit_record(v).get("committed_at", 0.0) <= timestamp:
                best = v
        if best is None:
            raise VersionNotFoundError(
                f"{self.path}: no version committed at or before "
                f"{timestamp} (earliest retained is newer)"
            )
        return best

    def read(
        self,
        version: int | None = None,
        *,
        timestamp_as_of: float | None = None,
        tag: str | None = None,
        columns: list[str] | None = None,
        where: str | None = None,
    ) -> DataFrame:
        """The table as of ``version`` (default: latest), as of a
        wall-clock instant via ``timestamp_as_of``, or at a named ref
        via ``tag``. Reading an old version is a plain parquet scan of
        that manifest's file list — no reconstruction, because
        manifests are complete snapshots.

        ``where`` scopes the read to the rows where the predicate is
        TRUE and — the driver-width point — resolves a PARTIAL
        manifest on checkpoint-anchored tables (:meth:`lookup`'s
        machinery): only stats-surviving candidate files ever
        materialize into driver Python or enter the plan, so a
        selective read of a 10^6-file table is O(candidates) on the
        driver and O(files-touched) in IO. ``columns`` projects the
        result; the select sits directly over the scan, so Catalyst
        pushes it into the parquet reader (pruned ReadSchema) — the
        predicate may reference non-projected columns."""
        if sum(x is not None for x in (version, timestamp_as_of, tag)) > 1:
            raise ValueError("pass at most one of version/timestamp_as_of/tag")
        if tag is not None:
            refs = self.tags()
            if tag not in refs:
                raise VersionNotFoundError(
                    f"{self.path}: no tag {tag!r} (have {sorted(refs)})"
                )
            version = refs[tag]
        if timestamp_as_of is not None:
            version = self.version_at(timestamp_as_of)
        if version is None:
            version = self.latest_version()
        if where is not None:
            out = self.lookup(where, version)
        else:
            m = self._manifest(version)
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            out = self._scan(m["files"], schema, m.get("dv"))
        if columns is not None:
            # resolve CASE-INSENSITIVELY, like Spark's own column
            # resolution (and this engine's constraint binding); the
            # projection emits the table's canonical names
            by_fold: dict[str, list[str]] = {}
            for c in out.columns:
                by_fold.setdefault(c.lower(), []).append(c)
            resolved = []
            for c in columns:
                hits = (
                    [c]
                    if c in out.columns
                    else by_fold.get(c.lower(), [])
                )
                if len(hits) != 1:
                    raise ValueError(
                        f"{self.path}: read column {c!r} "
                        f"{'is ambiguous among' if hits else 'not in table'}"
                        f" {hits or out.columns}"
                    )
                resolved.append(hits[0])
            out = out.select(*[F.col(f"`{c}`") for c in resolved])
        return out

    def lookup(
        self,
        condition: str,
        version: int | None = None,
        *,
        tag: str | None = None,
    ) -> DataFrame:
        """Filtered read that scans ONLY the stats-pruned candidate
        files — the read-side twin of DELETE's data skipping (Delta
        reads get this from the log automatically). Returns the rows
        where ``condition`` is TRUE; files whose manifest bounds prove
        no row can match never enter the plan, so a selective point or
        range lookup on a clustered table is O(files-touched). Falls
        back to the full snapshot scan for conditions outside the
        supported pruning fragment — same result, just unpruned."""
        if tag is not None:
            refs = self.tags()
            if tag not in refs:
                raise VersionNotFoundError(
                    f"{self.path}: no tag {tag!r} (have {sorted(refs)})"
                )
            version = refs[tag]
        if version is None:
            version = self.latest_version()
        # checkpoint-anchored tables resolve a PARTIAL snapshot: the
        # checkpoint streams through the bounds test and only candidate
        # files ever become driver Python — O(candidates), not O(table)
        m = self._manifest_pruned(version, condition)
        if m is not None:
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            candidates = m["files"]
        else:
            m = self._manifest(version)
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            candidates = prune_candidate_files(
                m["files"], m.get("stats") or {}, condition,
                stat_cols=set(_stat_columns(schema)),
                rename=_physical_names(schema),
            )
        if not candidates:
            return _rows_df(self.spark, [], schema)
        return self._scan(candidates, schema, m.get("dv")).filter(
            F.expr(condition).cast("boolean")
        )

    def overwrite(self, df: DataFrame) -> int:
        """Full-replace commit. Old files stay on disk (time travel)
        until vacuumed. CHECK constraints carry forward and the new
        content must satisfy them."""
        prev = (
            self._manifest(self.latest_version()) if self.versions() else None
        )
        cons = dict((prev or {}).get("constraints") or {})
        if cons:
            self._enforce(df, cons)
        hint = prev["version"] + 1 if prev else 0
        # overwrite re-derives schema from the batch: files are all new
        # and written under logical names, so any prior column mapping
        # RESETS here — and a user schema can never smuggle the
        # reserved physical_name key in
        schema_json = _sanitize_user_schema(df.schema).json()
        files = self._write_files(df, hint)
        return self._commit(
            "overwrite", add=files, remove=(prev or {}).get("files") or (),
            schema_json=schema_json, version=hint,
            constraints=cons,
            stats=self._collect_stats(files, schema_json),
            # full-state dependence: replacing a table whose contents
            # changed underneath is a lost update — typed conflict, no
            # silent rebase (Delta Serializable for INSERT OVERWRITE)
            txn=self._txn(prev, reads_all=True) if prev else None,
        )

    def _last_zorder_columns(self) -> list[str] | None:
        """PHYSICAL cluster columns of the table's newest ``zorder``
        commit, or None when the table was never clustered (legacy
        records without the physical twin fall back to the logical
        list — identical on unmapped tables). The walk is INCREMENTAL
        per instance: only records newer than the previous call are
        read, so a streaming writer calling ``append(cluster=True)``
        per micro-batch pays O(new commits) — never a full log walk,
        even on a never-clustered table."""
        vs = self.versions()
        if not hasattr(self, "_zorder_scan_upto"):
            self._zorder_scan_upto = -1
            self._zorder_cols: list[str] | None = None
        for v in vs:
            if v > self._zorder_scan_upto:
                rec = self._commit_record(v)
                if rec.get("op") == "zorder":
                    met = rec.get("metrics") or {}
                    cols = met.get(
                        "zorder_by_physical", met.get("zorder_by")
                    )
                    self._zorder_cols = list(cols) if cols else None
        if vs:
            self._zorder_scan_upto = max(self._zorder_scan_upto, vs[-1])
        return self._zorder_cols

    def _cluster_batch(
        self, df: DataFrame, cluster_files: int | None
    ) -> DataFrame | None:
        """Range-partition + sort ``df`` on the table's active cluster
        key so the batch's files land with DISJOINT cluster-column
        ranges (sharp stats from the first commit, no maintenance pass
        needed). None when the table has no active clustering or the
        batch lacks a cluster column. File count defaults to driver-side
        metadata sizing (~32 MB clustered files for file-backed
        batches, one file otherwise — the micro-batch case)."""
        from cdk_datalake_ingest_upeu_spark.sources.files import zorder_value

        phys_cols = self._last_zorder_columns()  # physical names
        if not phys_cols or not self.versions():
            return None
        # map back to the CURRENT logical names (the batch's columns):
        # a physical without a live logical (column dropped, or renamed
        # away and the anchor now stale) disables eager clustering —
        # plain append, conservative
        cur_schema = T.StructType.fromJson(
            json.loads(self._manifest(self.latest_version())["schema"])
        )
        rev = {p: l for l, p in _physical_names(cur_schema).items()}
        cols = [rev.get(p) for p in phys_cols]
        if any(c is None or c not in df.columns for c in cols):
            return None
        if cluster_files is None:
            total = 0
            try:
                from urllib.parse import unquote

                for uri in df.inputFiles():
                    p = uri
                    if p.startswith("file:"):
                        p = "/" + unquote(p[5:]).lstrip("/")
                    total += os.path.getsize(p)
            except Exception:
                total = 0
            cluster_files = max(1, min(256, total // (32 << 20) + 1))
        z = (
            F.col(cols[0]) if len(cols) == 1 else zorder_value(df, cols)
        )
        return (
            df.withColumn("__z", z)
            .repartitionByRange(cluster_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )

    def append(
        self,
        df: DataFrame,
        *,
        merge_schema: bool = False,
        epoch: int | None = None,
        app_id: str | None = None,
        cluster: bool = False,
        cluster_files: int | None = None,
    ) -> int:
        """Append-only commit: manifest = previous files + the batch's
        files. Cost is the batch, independent of table size.

        ``epoch`` makes the append IDEMPOTENT for streaming writers
        (Delta's txn-version pattern): a foreachBatch retry re-delivers
        the same epoch id, and an append whose epoch is already
        committed returns that version untouched instead of
        double-landing the batch. ``app_id`` namespaces the epoch per
        WRITER IDENTITY (Delta's txn ``{appId, version}``): two writers
        landing into the same table each keep their own epoch counter,
        and one writer's epoch ids can never satisfy — and therefore
        never skip — another's. Records carrying an app_id declare the
        ``txn-app-ids`` writer feature so a bare-epoch-keyed legacy
        writer fails closed instead of mis-reading them. The same
        parameter exists on :meth:`merge`, :meth:`delete`, and
        :meth:`delete_keys` with identical semantics.

        With ``merge_schema=True`` (Delta's ``mergeSchema`` option) the
        batch may carry NEW columns: the committed schema becomes the
        union (existing fields first, new fields appended), and reads
        of the evolved table fill the new columns with NULL for rows in
        pre-evolution files — the parquet reader does this by name, no
        rewrite of history. Without the flag, a batch whose columns
        differ from the table's raises instead of silently committing a
        mixed table; evolving a column's TYPE is refused either way
        (that is a rewrite, not an append).

        ``cluster=True`` lands the batch PRE-CLUSTERED on the table's
        active Z-order columns (the newest ``zorder`` commit's):
        range-partitioned + sorted, so the new files carry disjoint
        cluster-key ranges and stats-prune sharply from the first
        commit — liquid clustering's eager-write optimization, which
        also shrinks the next incremental maintenance pass's tail. A
        no-op (plain append) when the table was never clustered or the
        batch lacks a cluster column. ``cluster_files`` overrides the
        metadata-sized file count (~32 MB clustered files)."""
        if epoch is not None:
            v = self._epoch_version(epoch, app_id)
            if v is not None:
                return v
        if not self.versions():
            hint = 0
            schema_json = _sanitize_user_schema(df.schema).json()
            files = self._write_files(df, hint)
            return self._commit(
                "overwrite", add=files, schema_json=schema_json,
                epoch=epoch, app_id=app_id, version=hint,
                stats=self._collect_stats(files, schema_json),
            )
        prev = self._manifest(self.latest_version())
        cons = dict(prev.get("constraints") or {})
        if cons:
            self._enforce(df, cons)
        prev_schema = T.StructType.fromJson(json.loads(prev["schema"]))
        prev_names = {f.name: f for f in prev_schema.fields}
        new_names = {f.name: f for f in df.schema.fields}
        added = [f for f in df.schema.fields if f.name not in prev_names]
        widen_to: dict = {}
        narrow_files = False
        for name, f in new_names.items():
            if name in prev_names and f.dataType != prev_names[name].dataType:
                old_t = prev_names[name].dataType
                if _widens(f.dataType, old_t):
                    # batch NARROWER than the table: always fine — the
                    # narrow file reads up under the wide schema
                    # (type-widening's standing promise); the commit
                    # declares the feature, because narrow files under
                    # a wider schema now exist
                    narrow_files = True
                    continue
                if merge_schema and _widens(old_t, f.dataType):
                    # batch WIDER: mergeSchema widens the table type
                    # (Delta's automatic type widening under
                    # schema evolution)
                    widen_to[name] = f.dataType
                    continue
                raise ValueError(
                    f"{self.path}: column {name!r} type change "
                    f"{old_t} -> {f.dataType} is not an append; use "
                    f"widen_column for a lossless widening, or "
                    f"overwrite/merge for a rewrite"
                )
        if (added or set(prev_names) - set(new_names)) and not merge_schema:
            raise ValueError(
                f"{self.path}: batch columns {sorted(new_names)} != table "
                f"columns {sorted(prev_names)}; pass merge_schema=True"
            )
        schema = prev_schema
        if widen_to:
            schema = T.StructType(
                [
                    T.StructField(
                        pf.name,
                        widen_to.get(pf.name, pf.dataType),
                        pf.nullable,
                        pf.metadata,
                    )
                    for pf in prev_schema.fields
                ]
            )
        mapped = _mapping_active(prev_schema)
        for f in added:
            # user metadata never smuggles a physical name in (the
            # reserved key is this engine's alone); under active
            # mapping the born column gets a FRESH one — if its
            # logical name was ever dropped, reusing it would
            # resurrect the dropped column's bytes from old files
            md = {
                k: v for k, v in (f.metadata or {}).items()
                if k != _PHYSICAL_KEY
            }
            if mapped:
                md[_PHYSICAL_KEY] = _fresh_physical()
            f = T.StructField(f.name, f.dataType, f.nullable, md)
            schema = schema.add(f)
        hint = prev["version"] + 1
        clustered = None
        if cluster:
            clustered = self._cluster_batch(df, cluster_files)
        files = self._write_files(
            clustered if clustered is not None else df, hint,
            schema=schema,
        )
        # the append's record is O(batch files): adds only, no removes.
        # BLIND append: reads nothing, so it auto-rebases over any
        # concurrent commit except a metadata change (Delta's
        # ConcurrentAppend never conflicts with itself)
        return self._commit(
            "append", add=files, schema_json=schema.json(), epoch=epoch,
            app_id=app_id,
            version=hint, constraints=cons,
            stats=self._collect_stats(files, schema.json()),
            metrics=(
                {"clustered": True, "files": len(files)}
                if clustered is not None
                else None
            ),
            features=(
                {
                    "reader": ["type-widening"],
                    "writer": ["type-widening"],
                }
                if (widen_to or narrow_files)
                else None
            ),
            txn=self._txn(prev),
        )

    def merge(
        self,
        source: DataFrame,
        key_columns: list[str],
        resolve_by: list[str] | None = None,
        *,
        epoch: int | None = None,
        app_id: str | None = None,
    ) -> int:
        """Upsert ``source`` by ``key_columns`` — copy-on-write at file
        granularity, Delta MERGE's execution shape
        (``whenMatchedUpdateAll / whenNotMatchedInsertAll``, reference
        ``light_transform.py:1382-1392``): files holding a matched key
        are rewritten without their matched rows, the source batch is
        written as new files, untouched files carry over by NAME into
        the new manifest — zero IO for them.

        Source contract, matching Delta MERGE's: full-row duplicates in
        the source are dropped (benign — the reference's upsert drops
        them too, ``light_transform.py:1380``), but TWO DISTINCT source
        rows for the same key raise — Delta's multiple-match error —
        because silently keeping an arbitrary one would make the table's
        content nondeterministic. ``resolve_by`` opts into the
        documented deterministic resolution instead (the dedup-then-
        merge pipeline W1 implies, reference
        ``light_transform.py:1374-1392``): per key, keep the single row
        that sorts LAST by the listed columns (descending, NULLS LAST —
        "latest wins"); rows still tied on key + resolve columns with
        differing payloads remain ambiguous and raise, so the table's
        content never depends on execution order. The source's columns
        must match the table's by name and type (the same compatibility
        check :meth:`append` performs); merge does not evolve schema.

        ``epoch`` makes the merge IDEMPOTENT exactly like
        :meth:`append`'s and :meth:`delete`'s (Delta's txn-version
        pattern): a replayed batch whose epoch is already committed
        returns that version untouched — no re-scan, no rewrite."""
        if epoch is not None and self.versions():
            v = self._epoch_version(epoch, app_id)
            if v is not None:
                return v
        # merge is eager (it ends in file writes), so the batch-scale
        # source is persisted for its three scans here and unpersisted
        # before returning — no scratch leaks across queries. The
        # persisted handle stays in its own variable: rebinding
        # ``source`` through _resolve_source would leave the cached DF
        # unreachable by the finally block (a cache leak per call).
        persisted = source.dropDuplicates().persist()
        try:
            resolved = persisted
            if resolve_by:
                resolved = self._resolve_source(
                    persisted, key_columns, resolve_by
                )
            return self._merge_impl(
                resolved, key_columns, epoch=epoch, app_id=app_id
            )
        finally:
            persisted.unpersist()

    def _resolve_source(
        self, source: DataFrame, key_columns: list[str], resolve_by: list[str]
    ) -> DataFrame:
        """Latest-wins dedup of the merge source: one row_number window
        per key ordered by ``resolve_by`` descending (NULLS LAST, the
        explicit order both engines agree on). Ambiguity — two distinct
        rows tied on key AND resolve columns — raises rather than
        letting the window pick arbitrarily."""
        from pyspark.sql import Window

        missing = [c for c in resolve_by if c not in source.columns]
        if missing:
            raise ValueError(
                f"{self.path}: resolve_by columns {missing} not in source"
            )
        tie = (
            source.groupBy(*key_columns, *resolve_by)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if tie:
            tie_repr = {
                c: tie[0][c] for c in (*key_columns, *resolve_by)
            }
            raise ValueError(
                f"{self.path}: merge source has multiple distinct rows "
                f"tied on key + resolve columns {tie_repr}; resolve_by "
                f"cannot rank a unique winner — add a tie-breaking column"
            )
        w = Window.partitionBy(*key_columns).orderBy(
            *[F.col(c).desc_nulls_last() for c in resolve_by]
        )
        return (
            source.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def _merge_impl(
        self, source: DataFrame, key_columns: list[str],
        epoch: int | None = None, app_id: str | None = None,
    ) -> int:
        # ONE pass over the source covers both pre-flight needs (r14 —
        # they used to be two jobs): the per-key counts for Delta's
        # multiple-match probe, and the per-key-column [min, max]
        # envelope the keyed pruned resolution judges files with (the
        # group keys of the count rollup ARE the distinct key values,
        # so their min/max equal the source's).
        env_cols = [
            c for c in key_columns
            if isinstance(source.schema[c].dataType, _STAT_ATOMS)
        ]
        aggs = [F.max("__n").alias("__dupmax")]
        for i, c in enumerate(env_cols):
            aggs.append(F.min(F.col(f"`{c}`")).alias(f"__mn{i}"))
            aggs.append(F.max(F.col(f"`{c}`")).alias(f"__mx{i}"))
        pre = (
            source.groupBy(*key_columns)
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(*aggs)
            .first()
        )
        if pre["__dupmax"] is not None and pre["__dupmax"] > 1:
            # error path only: re-run the probe to NAME the offending
            # key in the message. A nondeterministic source can make
            # the re-probe miss (review r14) — the error still raises,
            # just without a concrete key.
            dup = (
                source.groupBy(*key_columns)
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .limit(1)
                .collect()
            )
            key_repr = (
                {k: dup[0][k] for k in key_columns}
                if dup
                else "<source nondeterministic between probes>"
            )
            raise ValueError(
                f"{self.path}: merge source has multiple distinct rows "
                f"for key {key_repr} — Delta MERGE raises on multiple "
                f"matches; de-duplicate the source to one row per key "
                f"first"
            )
        envelope = {
            c: (pre[f"__mn{i}"], pre[f"__mx{i}"])
            for i, c in enumerate(env_cols)
        }
        if not self.versions():
            # genesis merge: commit directly so ``epoch`` is recorded
            # (overwrite() would drop it and a replay would re-land)
            schema_json = _sanitize_user_schema(source.schema).json()
            files = self._write_files(source, 0)
            return self._commit(
                "overwrite", add=files, schema_json=schema_json,
                version=0, epoch=epoch, app_id=app_id,
                stats=self._collect_stats(files, schema_json),
            )
        head = self.latest_version()
        # keyed pruned resolution: on a checkpoint-anchored table only
        # the envelope-surviving candidate files materialize driver-side
        # (O(candidates) at 10^6 files); full resolution is the fallback
        prev = self._manifest_pruned_keys(
            head, source, key_columns, envelope=envelope
        )
        pre_pruned = prev is not None
        if not pre_pruned:
            prev = self._manifest(head)
        files_total = prev.get("n_files_total", len(prev["files"]))
        cons = dict(prev.get("constraints") or {})
        if cons:
            self._enforce(source, cons)
        prev_schema = T.StructType.fromJson(json.loads(prev["schema"]))
        prev_names = {f.name: f for f in prev_schema.fields}
        src_names = {f.name: f for f in source.schema.fields}
        for name, f in src_names.items():
            if name in prev_names and f.dataType != prev_names[name].dataType:
                old_t = prev_names[name].dataType
                if _widens(f.dataType, old_t):
                    # narrower source after a widen: cast up so the
                    # kept-rows union and the written files carry the
                    # table's (wider) type — lossless by _widens
                    source = source.withColumn(
                        name, F.col(f"`{name}`").cast(old_t)
                    )
                    continue
                raise ValueError(
                    f"{self.path}: merge source column {name!r} type "
                    f"{f.dataType} != table type {old_t}; merge does "
                    f"not evolve schema (use widen_column first for a "
                    f"lossless widening)"
                )
        if set(prev_names) != set(src_names):
            raise ValueError(
                f"{self.path}: merge source columns {sorted(src_names)} != "
                f"table columns {sorted(prev_names)}; merge does not evolve "
                f"schema (use append(merge_schema=True) for new columns)"
            )
        hint = prev["version"] + 1
        if files_total == 0:
            files = self._write_files(source, hint, schema=prev_schema)
            return self._commit(
                "merge", add=files, schema_json=prev["schema"],
                version=hint, constraints=cons, epoch=epoch,
                app_id=app_id,
                stats=self._collect_stats(files, prev["schema"]),
                txn=self._txn(prev, conflict_on_add=True),
            )
        # candidate pruning from per-file key bounds BEFORE any scan:
        # a file whose [min, max] range for some key column misses the
        # source's key range cannot hold a matched key (NULL keys never
        # equi-match on either side). The key-projected scan below then
        # touches only the surviving candidates — at 100 TB this is the
        # difference between a manifest walk and a table scan.
        candidates = (
            prev["files"]
            if pre_pruned
            else self._prune_merge_candidates(
                prev, source, key_columns, envelope=envelope
            )
        )
        metrics = {
            "files_total": files_total,
            "files_candidate": len(candidates),
        }
        keys = source.select(*key_columns).distinct()
        if candidates:
            # manifest-schema read for the same reason delete() uses
            # one: on a schema-evolved table, pre-evolution files must
            # backfill NULL for the new columns rather than fail (or
            # worse, drop them) on a footer-inferred schema. DV-aware:
            # a key that only exists in masked rows matches nothing.
            cur = self._scan(
                candidates, prev_schema, prev.get("dv"), file_col="__file"
            )
            touched_rows = (
                cur.join(F.broadcast(keys), key_columns, "left_semi")
                .select("__file")
                .distinct()
                .collect()
            )
            # NB: r["__file"], not attribute access — a dunder attribute
            # inside a class body gets Python name-mangled
            by_name = self._rels_by_name(candidates)
            touched = sorted(by_name[r["__file"]] for r in touched_rows)
        else:
            touched = []
        metrics["files_rewritten"] = len(touched)
        if touched:
            kept = self._scan(touched, prev_schema, prev.get("dv")).join(
                F.broadcast(keys), key_columns, "left_anti"
            )
            new_df = kept.unionByName(source)
        else:
            new_df = source
        new_files = self._write_files(new_df, hint, schema=prev_schema)
        # record = adds + removes only; untouched files carry over
        # implicitly (zero record bytes AND zero IO for them)
        return self._commit(
            "merge", add=new_files, remove=touched,
            schema_json=prev["schema"], version=hint,
            constraints=cons, epoch=epoch, app_id=app_id,
            stats=self._collect_stats(new_files, prev["schema"]),
            metrics=metrics,
            # read set = the key-bounds candidates; any concurrent ADD
            # conflicts (it may hold a matched key the key-envelope
            # pruning cannot rule out after the fact)
            txn=self._txn(
                prev, read_files=candidates, conflict_on_add=True
            ),
        )

    def delete_keys(
        self,
        keys: DataFrame,
        key_columns: list[str],
        *,
        epoch: int | None = None,
        app_id: str | None = None,
    ) -> int:
        """DELETE every row whose key appears in ``keys`` — the keyed
        twin of :meth:`delete` for when the victims arrive as a
        DATAFRAME (change-feed appliers, takedown id lists) rather than
        a predicate. One commit, merge's exact execution shape minus
        the re-insert: candidate files are pruned by per-file key
        bounds against the batch's key envelope (zero IO), only files
        actually holding a matched key are rewritten without those
        rows, everything else carries by name. NULL keys never match
        (equi-join semantics), duplicate keys in the batch are
        harmless. ``epoch`` gives the same idempotent-replay contract
        as :meth:`append`/:meth:`merge`/:meth:`delete`.

        The scale point: k victim keys cost ONE pruned scan + one
        commit — never k DELETE statements (a change-feed applier that
        loops per-key pays k full job launches and k commits)."""
        if epoch is not None and self.versions():
            v = self._epoch_version(epoch, app_id)
            if v is not None:
                return v
        if not self.versions():
            raise VersionNotFoundError(f"{self.path}: no commits")
        kdf = keys.select(*key_columns).dropDuplicates().persist()
        try:
            head = self.latest_version()
            # keyed pruned resolution — same driver-width shape as
            # merge's: candidates only, never the full file list
            prev = self._manifest_pruned_keys(head, kdf, key_columns)
            pre_pruned = prev is not None
            if not pre_pruned:
                prev = self._manifest(head)
            files_total = prev.get("n_files_total", len(prev["files"]))
            if files_total == 0:
                return prev["version"]
            missing = [
                c for c in key_columns
                if c not in T.StructType.fromJson(
                    json.loads(prev["schema"])
                ).fieldNames()
            ]
            if missing:
                raise ValueError(
                    f"{self.path}: key columns {missing} not in table"
                )
            candidates = (
                prev["files"]
                if pre_pruned
                else self._prune_merge_candidates(prev, kdf, key_columns)
            )
            metrics = {
                "files_total": files_total,
                "files_candidate": len(candidates),
            }
            if not candidates:
                return prev["version"]
            schema = T.StructType.fromJson(json.loads(prev["schema"]))
            cur = self._scan(
                candidates, schema, prev.get("dv"), file_col="__file"
            )
            touched_rows = (
                cur.join(F.broadcast(kdf), key_columns, "left_semi")
                .select("__file")
                .distinct()
                .collect()
            )
            if not touched_rows:
                return prev["version"]
            by_name = self._rels_by_name(candidates)
            touched = sorted(by_name[r["__file"]] for r in touched_rows)
            metrics["files_rewritten"] = len(touched)
            hint = prev["version"] + 1
            kept = self._scan(touched, schema, prev.get("dv")).join(
                F.broadcast(kdf), key_columns, "left_anti"
            )
            new_files = self._write_files(kept, hint, schema=schema)
            return self._commit(
                "delete", add=new_files, remove=touched,
                schema_json=prev["schema"], version=hint, epoch=epoch,
                app_id=app_id,
                constraints=dict(prev.get("constraints") or {}),
                stats=self._collect_stats(new_files, prev["schema"]),
                metrics=metrics,
                # same conflict posture as merge: the read set is the
                # key-bounds candidates, and any concurrent ADD may
                # hold a victim key the envelope cannot rule out
                txn=self._txn(
                    prev, read_files=candidates, conflict_on_add=True
                ),
            )
        finally:
            kdf.unpersist()

    def _prune_merge_candidates(
        self,
        prev: dict,
        source: DataFrame,
        key_columns: list[str],
        envelope: dict | None = None,
    ) -> list[str]:
        """Files that may hold a key present in ``source``, judged by
        overlap of per-file key bounds with the source's key envelope —
        one bounded aggregation over the batch (2 scalars per key
        column), zero table IO; a caller that already aggregated the
        batch can hand the bounds in via ``envelope`` (col ->
        (min, max)) and skip that job. Conservative: files without
        stats, and key columns without a usable envelope, never
        exclude."""
        stats = prev.get("stats") or {}
        if not stats:
            return list(prev["files"])
        schema = T.StructType.fromJson(json.loads(prev["schema"]))
        by_name = {f.name: f.dataType for f in schema.fields}
        phys = _physical_names(schema)
        cols = [
            c for c in key_columns
            if isinstance(by_name.get(c), _STAT_ATOMS)
        ]
        if envelope is not None:
            # a column missing from the caller's envelope contributes
            # no bound — and must not exclude files via the
            # missing-column rule below either, so drop it entirely
            cols = [c for c in cols if c in envelope]
        if not cols:
            return list(prev["files"])
        if envelope is not None:
            vals = {c: envelope[c] for c in cols}
        else:
            aggs = []
            for i, c in enumerate(cols):
                aggs.append(F.min(F.col(f"`{c}`")).alias(f"__mn{i}"))
                aggs.append(F.max(F.col(f"`{c}`")).alias(f"__mx{i}"))
            row = source.agg(*aggs).first()
            vals = {
                c: (row[f"__mn{i}"], row[f"__mx{i}"])
                for i, c in enumerate(cols)
            }
        # per-file stats are keyed by PHYSICAL name (stable across
        # renames); the source envelope above is logical
        pcols = [(phys.get(c, c), c) for c in cols]
        out = []
        for f in prev["files"]:
            st = stats.get(f)
            if not st:
                out.append(f)
                continue
            excluded = False
            for c, lc in pcols:
                smn, smx = _stat_value(vals[lc][0]), _stat_value(
                    vals[lc][1]
                )
                if c not in st:
                    # file predates the key column: all NULL there,
                    # an equi-join can never match
                    excluded = True
                    break
                fmn, fmx = st[c]
                if (
                    smx is not None and fmn is not None
                    and _comparable(smx, fmn) and smx < fmn
                ) or (
                    smn is not None and fmx is not None
                    and _comparable(smn, fmx) and smn > fmx
                ):
                    excluded = True
                    break
            if not excluded:
                out.append(f)
        return out

    def _rel_path(self, uri: str) -> str:
        # input_file_name() returns URL-encoded file: URIs — a table
        # path with a space or '%' must decode back to the on-disk
        # name, or stats/touched-file bookkeeping silently misses it
        from urllib.parse import unquote

        p = uri
        if p.startswith("file:"):
            p = "/" + unquote(p[5:]).lstrip("/")
        return os.path.relpath(p, self.path)

    def delete(
        self, condition: str, *, mode: str = "cow",
        epoch: int | None = None, app_id: str | None = None,
    ) -> int:
        """DELETE FROM table WHERE condition. Rows where the condition
        is NULL are kept (SQL DELETE semantics: only TRUE removes).
        Returns the new version, or the current one unchanged when
        nothing matched (Delta likewise skips the empty commit).

        ``mode="cow"`` (default) — copy-on-write at file granularity,
        Delta DELETE's classic shape: one condition-projected scan
        finds the files that CONTAIN a matching row, only those are
        rewritten without their matching rows, everything else carries
        over by name with zero IO.

        ``mode="dv"`` — deletion vectors, Delta's merge-on-read shape:
        NO data file is rewritten at all; the matched rows' positions
        land in a sidecar parquet and the commit's ``dv`` field masks
        them, applied by every subsequent read as one anti-join.
        :meth:`compact` purges the masks. The right mode for frequent
        small takedowns where COW would re-write a large file per
        handful of rows.

        Scale shape (both modes): candidate files come FIRST from the
        manifest's per-file [min, max] bounds — on a checkpoint-
        anchored table via :meth:`_manifest_pruned` (the checkpoint
        streams through the bounds test; only candidates ever become
        driver Python, O(candidates) at 10^6 files), else
        :func:`prune_candidate_files` over the resolved manifest (zero
        IO, O(manifest)); only the surviving candidates pay the
        condition-projected scan. The
        commit records files_total/files_candidate/files_rewritten
        (+ dv_rows for mode="dv") in its manifest metrics.

        ``epoch`` makes the delete IDEMPOTENT for streaming writers,
        exactly like :meth:`append`'s (Delta's txn-version pattern): a
        replayed foreachBatch re-delivers the same epoch id, and a
        delete whose epoch is already committed returns that version
        untouched — no duplicate sidecar, no duplicate rewrite.
        Idempotence keys on the epoch alone (the caller promises a
        replayed epoch carries the same condition)."""
        if mode not in ("cow", "dv"):
            raise ValueError(f"delete mode must be 'cow' or 'dv', got {mode!r}")
        if epoch is not None:
            v = self._epoch_version(epoch, app_id)
            if v is not None:
                return v
        head = self.latest_version()
        # predicate-pruned resolution — same driver-width shape as
        # lookup()'s: on a checkpoint-anchored table only the files
        # whose bounds cannot exclude the condition materialize into
        # driver Python (O(candidates) at 10^6 files); full resolution
        # is the fallback
        prev = self._manifest_pruned(head, condition)
        pre_pruned = prev is not None
        if not pre_pruned:
            prev = self._manifest(head)
        files_total = prev.get("n_files_total", len(prev["files"]))
        hint = prev["version"] + 1
        if files_total == 0:
            return prev["version"]
        schema = T.StructType.fromJson(json.loads(prev["schema"]))
        candidates = (
            prev["files"]
            if pre_pruned
            else prune_candidate_files(
                prev["files"], prev.get("stats") or {}, condition,
                stat_cols=set(_stat_columns(schema)),
                rename=_physical_names(schema),
            )
        )
        if not candidates:
            return prev["version"]
        cond = F.expr(condition).cast("boolean")
        if mode == "dv":
            return self._delete_dv(
                prev, schema, candidates, cond, hint, epoch=epoch,
                app_id=app_id,
                condition=condition,
            )
        # read THROUGH the manifest schema, like read()/changes()/compact():
        # on a schema-evolved table, pre-evolution files lack the new
        # columns and a schemaless read would infer from an arbitrary
        # footer — the rewrite could silently drop evolved-column values
        # the committed manifest still declares. The scan is DV-aware:
        # already-masked rows are neither matched nor resurrected.
        cur = self._scan(candidates, schema, prev.get("dv"), file_col="__file")
        touched_rows = (
            cur.filter(cond).select("__file").distinct().collect()
        )
        by_name = self._rels_by_name(candidates)
        touched = sorted(by_name[r["__file"]] for r in touched_rows)
        if not touched:
            return prev["version"]
        kept = self._scan(touched, schema, prev.get("dv")).filter(
            ~F.coalesce(cond, F.lit(False))
        )
        new_files = self._write_files(kept, hint, schema=schema)
        return self._commit(
            "delete", add=new_files, remove=touched,
            schema_json=prev["schema"], version=hint, epoch=epoch,
            app_id=app_id,
            constraints=dict(prev.get("constraints") or {}),
            stats=self._collect_stats(new_files, prev["schema"]),
            metrics={
                "files_total": files_total,
                "files_candidate": len(candidates),
                "files_rewritten": len(touched),
            },
            # read set = the stats candidates; concurrent adds conflict
            # only when THEIR stats admit rows matching our predicate
            txn=self._txn(
                prev, read_files=candidates, read_predicate=condition
            ),
        )

    def _delete_dv(
        self,
        prev: dict,
        schema: T.StructType,
        candidates: list[str],
        cond,
        hint: int,
        *,
        epoch: int | None = None,
        app_id: str | None = None,
        condition: str | None = None,
    ) -> int:
        """Merge-on-read DELETE: write the matched row positions as a
        sidecar, commit a zero-data-IO record masking them. One scan of
        the candidates with metadata columns; the previous mask is
        anti-joined first so already-deleted rows are never re-listed."""
        scan = self._read_physical(
            candidates, schema,
            meta=(("file_name", "__fn"), ("row_index", "__ri")),
        )
        prev_sidecars = [
            s
            for f, lst in (prev.get("dv") or {}).items()
            if f in set(candidates)
            for s in lst
        ]
        if prev_sidecars:
            mask = self._dv_sidecar_rows(prev_sidecars).select(
                F.col("file_name").alias("__fn"),
                F.col("row_index").alias("__ri"),
            )
            scan = scan.join(mask, ["__fn", "__ri"], "left_anti")
        hits = scan.filter(cond).select(
            F.col("__fn").alias("file_name"),
            F.col("__ri").alias("row_index"),
        )
        # run-length encode before writing: sidecar bytes track the
        # mask's RUN structure (a contiguous takedown is a few rows),
        # never one row per deleted position
        sidecar_files = self._write_files(
            self._encode_dv_runs(hits).coalesce(1), hint
        )
        # map the touched basenames back to data-file rels for the
        # record's dv field, and count masked rows, off the RUNS —
        # bounded (one row per run), no decode
        agg = (
            self._dv_sidecar_runs(sidecar_files)
            .groupBy("file_name")
            .agg(F.sum("n").alias("__rows"))
            .collect()
        )
        touched_names = {r["file_name"] for r in agg}
        if not touched_names:
            # nothing matched: drop the empty sidecar dir, no commit
            shutil.rmtree(os.path.dirname(self._abs(sidecar_files[0])))
            return prev["version"]
        touched = [
            f for f in candidates
            if os.path.basename(f) in touched_names
        ]
        n_rows = sum(r["__rows"] for r in agg)
        return self._commit(
            "delete_dv", schema_json=prev["schema"], version=hint,
            epoch=epoch, app_id=app_id,
            constraints=dict(prev.get("constraints") or {}),
            dv={f: sidecar_files for f in touched},
            metrics={
                "files_total": prev.get(
                    "n_files_total", len(prev["files"])
                ),
                "files_candidate": len(candidates),
                "files_rewritten": 0,
                "dv_files": len(touched),
                "dv_rows": n_rows,
            },
            txn=self._txn(
                prev, read_files=candidates, read_predicate=condition
            ),
        )

    # -- change feed ---------------------------------------------------------

    def _chain_delta(
        self, from_version: int, to_version: int
    ) -> dict | None:
        """Manifest DIFF between two versions from the chain's delta
        records alone — neither full manifest materializes (the
        change-feed driver-width shape: a poll on a 10^6-file table
        costs O(commits polled), never O(files)). Returns
        ``{"only0", "only1", "dv1", "dv_common", "schema"}`` where
        only0/only1 are the symmetric-difference file lists, dv1 the
        chain-accumulated sidecars of only1 files, and dv_common the
        FRESH sidecars of carried-over files (their m0 masks are
        irrelevant: new sidecars exclude previously-masked positions at
        write time). A file a chain record removes AND re-adds
        (restore, consolidate_dv — the mask-reset mechanism) lands in
        BOTH lists; the caller's exceptAll then nets its live-row delta
        exactly, which is precisely the dv-delta/resurrect arm's
        semantics. Returns None — caller falls back to the two-manifest
        diff — when a legacy full-snapshot record interrupts the chain
        or an INTERMEDIATE record was vacuumed (a tag-pinned history
        can retain checkpointed endpoints across a dropped middle; the
        full path resolves those via their anchors, so a raise here
        would regress previously-working calls). Raises
        :class:`VersionNotFoundError` only when an ENDPOINT record is
        gone — exactly when the full path's own _commit_record probe
        raises (the feed reader's truncation signal depends on it)."""
        vs = self.versions()
        for endpoint in (from_version, to_version):
            if endpoint not in vs:
                raise VersionNotFoundError(
                    f"{self.path}: version {endpoint} not found "
                    f"(have {vs})"
                )
        chain = [u for u in vs if from_version < u <= to_version]
        if chain != list(range(from_version + 1, to_version + 1)):
            return None  # mid-chain vacuum gap: two-manifest fallback
        recs = [self._commit_record(u) for u in chain]
        if any("files" in r for r in recs):
            return None  # legacy snapshot resets resolution: fall back
        # reader-feature gate, exactly the full path's: commits in the
        # polled range may REQUIRE features this engine lacks, and a
        # feed computed while ignoring them could misread masked data
        unknown = set().union(
            *(
                set((r.get("protocol") or {}).get("reader", ()))
                for r in recs
            )
        ) - _READER_FEATURES if recs else set()
        if unknown:
            raise TableFeatureError(
                f"{self.path}: versions {from_version}..{to_version} "
                f"require reader feature(s) {sorted(unknown)} this "
                f"engine does not implement; reading the change feed "
                f"anyway could corrupt results — upgrade the engine"
            )
        added: set = set()
        removed0: set = set()  # removed files that were live at m0
        dv_added: dict = {}  # fresh sidecars per still-live file
        schema = None
        for r in recs:
            for f in r.get("remove") or ():
                # a removed file's mask is irrelevant; if re-added
                # later (restore/consolidate) its sidecars re-accrue
                dv_added.pop(f, None)
                if f in added:
                    added.discard(f)
                else:
                    removed0.add(f)
            for f in r.get("add") or ():
                added.add(f)
            for f, sidecars in (r.get("dv") or {}).items():
                cur = dv_added.setdefault(f, [])
                for s in sidecars:
                    if s not in cur:
                        cur.append(s)
            schema = r["schema"]
        return {
            "only0": sorted(removed0),
            "only1": sorted(added),
            "dv1": {
                f: lst for f, lst in dv_added.items()
                if f in added and lst
            },
            "dv_common": {
                f: lst for f, lst in dv_added.items()
                if f not in added and f not in removed0 and lst
            },
            "schema": schema,
        }

    def changes(self, from_version: int, to_version: int) -> DataFrame:
        """Row-level change feed between two versions — the Delta Change
        Data Feed analog (the reference's consumers would read Delta CDF
        from the tables ``light_transform.py:1363-1409`` writes). Returns
        the table's rows with a ``_change_type`` column (``'insert'`` /
        ``'delete'``); a MERGE update surfaces as a delete+insert pair at
        the same key, CDF's pre/post-image pair without the image labels.

        Scale shape — the point of reading changes instead of diffing
        snapshots: only the SYMMETRIC-DIFFERENCE files of the two
        manifests are read. Files carried over by name hold byte-identical
        rows and never enter the plan, so an append's change feed costs
        exactly the appended batch (zero comparison work: the from-side is
        empty) and a merge's costs its touched files — never the table.
        Within the differing files, ``exceptAll`` (multiset difference)
        cancels rows a merge rewrote unchanged into new files, making the
        feed row-exact, not file-granular."""
        if from_version == to_version:
            raise ValueError("change feed needs two distinct versions")
        if from_version > to_version:
            raise ValueError(
                f"from_version {from_version} is newer than {to_version}"
            )
        # chain-record fast path: the file diff and every fresh sidecar
        # come from the polled delta records alone; the ONLY per-file
        # state needed from history is the m0 deletion vectors of the
        # removed files, resolved as a path-filtered partial snapshot —
        # no full manifest materializes on either side
        delta = self._chain_delta(from_version, to_version)
        dv_deleted = dv_inserted = None
        if delta is not None:
            only0, only1 = delta["only0"], delta["only1"]
            dv1 = delta["dv1"]
            if only0:
                m0p = self._resolve_pruned(
                    from_version,
                    lambda _schema: (lambda _st: False),  # keep-all
                    path_set=set(only0),
                )
                if m0p is None:
                    delta = None  # no anchor / legacy: two-manifest path
                else:
                    dv0 = m0p.get("dv") or {}
            else:
                dv0 = {}
        if delta is not None:
            schema = T.StructType.fromJson(json.loads(delta["schema"]))
            if delta["dv_common"]:
                dv_deleted = self._dv_fresh_rows(
                    delta["dv_common"], schema, {}
                )
        else:
            m0, m1 = self._manifest(from_version), self._manifest(to_version)
            dv0 = m0.get("dv") or {}
            dv1 = m1.get("dv") or {}
            only0 = sorted(set(m0["files"]) - set(m1["files"]))
            only1 = sorted(set(m1["files"]) - set(m0["files"]))
            schema = T.StructType.fromJson(json.loads(m1["schema"]))
            # DV-delta arms: a file carried by BOTH versions never
            # enters the file diff, but sidecars added (or, via
            # restore, dropped) between the versions change its LIVE
            # rows — read exactly the newly-masked (resp. unmasked)
            # positions from the shared file. (On the chain path the
            # resurrect arm is structurally empty: mask shrink only
            # happens via remove+add, which lands the file in both
            # only-lists instead.)
            common = set(m0["files"]) & set(m1["files"])
            dv_deleted = self._dv_delta_rows(common, schema, dv0, dv1)
            dv_inserted = self._dv_delta_rows(common, schema, dv1, dv0)
        # each side reads through ITS OWN deletion vectors: the feed
        # compares live rows as of each version, not raw file bytes
        before = self._scan(only0, schema, dv0)
        after = self._scan(only1, schema, dv1)
        deleted = before.exceptAll(after)
        inserted = after.exceptAll(before)
        # arms are attached ONLY when a delta exists: unioning an empty
        # relation onto every feed cost ~0.5 s/call of pure plan
        # overhead on DV-free tables (the r10->r11
        # stage_versioned_delete regression, isolated A/B in
        # DRIFT_r11.md)
        if dv_deleted is not None:
            deleted = deleted.unionByName(dv_deleted)
        if dv_inserted is not None:
            inserted = inserted.unionByName(dv_inserted)
        return deleted.withColumn(
            "_change_type", F.lit("delete")
        ).unionByName(inserted.withColumn("_change_type", F.lit("insert")))

    def changes_by_commit(
        self, from_version: int, to_version: int
    ) -> DataFrame:
        """Delta CDF's FULL schema: the change feed at per-commit
        granularity, each row stamped with the ``_commit_version`` and
        ``_commit_timestamp`` that produced it (:meth:`changes`
        collapses the whole range — a row inserted then deleted inside
        it nets out; here it appears under both commits). Built as the
        union of the consecutive single-step feeds, so the plan grows
        with the RANGE, not the table — poll bounded ranges (the
        change-feed tail reader does by construction)."""
        if from_version >= to_version:
            raise ValueError(
                f"need from_version < to_version, got "
                f"{from_version} >= {to_version}"
            )
        out = None
        for v in range(from_version, to_version):
            rec = self._commit_record(v + 1)
            step = (
                self.changes(v, v + 1)
                .withColumn(
                    "_commit_version", F.lit(v + 1).cast("long")
                )
                .withColumn(
                    # TIMESTAMP, not epoch-seconds DOUBLE: Delta CDF's
                    # _commit_timestamp is a timestamp column, and
                    # consumers ported from it (date filters, window
                    # joins on commit time) type against that
                    "_commit_timestamp",
                    F.timestamp_seconds(
                        F.lit(float(rec.get("committed_at", 0.0)))
                    ),
                )
            )
            # allowMissingColumns: a merge_schema append inside the
            # range widens later steps' schemas; earlier steps
            # NULL-backfill the new columns, matching read()'s own
            # pre-evolution-file semantics
            out = (
                step
                if out is None
                else out.unionByName(step, allowMissingColumns=True)
            )
        return out

    def _dv_delta_rows(
        self,
        common: set,
        schema: T.StructType,
        dv_base: dict,
        dv_new: dict,
    ) -> DataFrame | None:
        """Rows of files in ``common`` masked by ``dv_new`` but NOT by
        ``dv_base`` — the rows a DV commit deleted (or a restore
        resurrected, with the argument order flipped). Reads only the
        affected files, semi-joined to only the delta sidecars. Returns
        None when no file's mask changed — the caller skips the union
        entirely (DV-free feeds pay zero DV plan overhead)."""
        delta = {}
        for f in common:
            base = set(dv_base.get(f) or [])
            fresh = [s for s in (dv_new.get(f) or []) if s not in base]
            if fresh:
                delta[f] = fresh
        if not delta:
            return None
        return self._dv_fresh_rows(delta, schema, dv_base)

    def _dv_fresh_rows(
        self, delta: dict, schema: T.StructType, dv_base: dict
    ) -> DataFrame:
        """Read the rows at the positions ``delta``'s fresh sidecars
        mask, minus positions ``dv_base`` already masked — the reading
        core of :meth:`_dv_delta_rows`, shared with the chain-record
        change feed (which passes ``dv_base={}``: along a remove-free
        chain every new sidecar excludes previously-masked positions at
        write time, so the base anti-join is provably a no-op)."""
        cols = schema.fieldNames()
        scan = self._read_physical(
            sorted(delta), schema,
            meta=(("file_name", "__fn"), ("row_index", "__ri")),
        )
        fresh_mask = self._dv_sidecar_rows(
            [s for lst in delta.values() for s in lst]
        ).select(
            F.col("file_name").alias("__fn"),
            F.col("row_index").alias("__ri"),
        )
        out = scan.join(fresh_mask, ["__fn", "__ri"], "left_semi")
        base_sidecars = [
            s for f in delta for s in (dv_base.get(f) or [])
        ]
        if base_sidecars:
            base_mask = self._dv_sidecar_rows(base_sidecars).select(
                F.col("file_name").alias("__fn"),
                F.col("row_index").alias("__ri"),
            )
            out = out.join(base_mask, ["__fn", "__ri"], "left_anti")
        return out.select(*cols)

    def restore(self, version: int) -> int:
        """Delta RESTORE's analog: a NEW commit whose manifest is the
        target version's file list, carried over by NAME — zero data
        IO, the restore is pure bookkeeping, and the rolled-back
        history stays readable (restore is an append to history, not a
        rewrite of it). The restored files must still exist: restoring
        past a vacuum raises :class:`VersionNotFoundError` exactly as
        Delta refuses to restore beyond its retention.

        The restored SNAPSHOT is validated against the table's CURRENT
        CHECK constraints before committing — a restore is a commit
        like any other, and without the check a table could end with an
        active constraint its own content violates (subsequent appends
        only probe the incoming batch). Restoring pre-constraint data
        therefore raises :class:`ConstraintViolationError`; drop the
        constraint first if that rollback is really wanted."""
        cur = self._manifest(self.latest_version())
        hint = cur["version"] + 1
        m = self._manifest(version)
        needed = list(m["files"]) + [
            s for lst in (m.get("dv") or {}).values() for s in lst
        ]
        missing = [f for f in needed if not os.path.exists(self._abs(f))]
        if missing:
            raise VersionNotFoundError(
                f"{self.path}: version {version} files vacuumed: {missing[:3]}"
            )
        cons = dict(cur.get("constraints") or {})
        if cons and m["files"]:
            self._enforce(self.read(version), cons)
        # delta against the CURRENT snapshot: re-add what the target had
        # and we dropped, remove what we gained since — zero data IO,
        # and the re-added files bring their original stats along.
        # Files carried by BOTH whose deletion vectors DIFFER are listed
        # in remove+add: resolution clears the dv on remove and the
        # record re-sets the target's — DV state is restored exactly
        # (a plain union could never SHRINK a mask).
        cur_dv = cur.get("dv") or {}
        target_dv = m.get("dv") or {}
        add = set(m["files"]) - set(cur["files"])
        remove = set(cur["files"]) - set(m["files"])
        for f in set(m["files"]) & set(cur["files"]):
            if sorted(cur_dv.get(f) or []) != sorted(target_dv.get(f) or []):
                add.add(f)
                remove.add(f)
        target_stats = m.get("stats") or {}
        return self._commit(
            "restore", add=sorted(add), remove=sorted(remove),
            schema_json=m["schema"],
            version=hint, constraints=cons,
            stats={f: target_stats[f] for f in add if f in target_stats},
            dv={f: target_dv[f] for f in add if target_dv.get(f)},
            # the restore delta was computed against the CURRENT
            # snapshot: any concurrent change invalidates it (typed)
            txn=self._txn(cur, reads_all=True),
        )

    # -- maintenance -------------------------------------------------------

    def compact(
        self,
        max_file_bytes: int = 32 * 1024 * 1024,
        *,
        zorder_by: list[str] | None = None,
        target_files: int | None = None,
        incremental: bool = False,
        where: str | None = None,
    ) -> int:
        """OPTIMIZE: bin-pack the current snapshot's SMALL files (< the
        threshold) into one rewrite, carrying every already-large file
        over by name — Delta ``OPTIMIZE``'s execution shape, where
        compaction cost tracks the small-file debt, never the table
        size. The rewrite lands as a new commit (``op='compact'``) with
        identical logical content; prior versions stay readable until
        :meth:`vacuum`. Returns the new version (or the current one
        unchanged when fewer than two files are under the threshold —
        rewriting a single small file buys nothing).

        ``zorder_by`` switches to Delta ``OPTIMIZE ZORDER BY``'s
        semantics instead: the WHOLE snapshot is rewritten clustered on
        the interleaved Morton key of the listed columns
        (``sources/files.zorder_value``) into ``target_files`` files
        (``op='zorder'``), so each file covers a small hyper-rectangle
        of the cluster-column space and the per-file [min, max] stats
        every commit stores become sharp — stats-pruned DELETE/MERGE
        then skip most files on predicates over ANY clustered column.
        Like Delta's, this is a deliberate full rewrite of the
        optimized scope (here: the snapshot); cost is the snapshot
        size, paid once to make every later selective operation
        O(files-touched).

        ``where`` (Delta's ``OPTIMIZE ... WHERE``) scopes the bin-pack
        to files whose manifest stats MAY match the predicate — judged
        with zero IO by the same tri-valued evaluator DELETE uses —
        so a hot region's small-file debt is paid without rewriting
        (or even statting) the cold rest of the table. Composes with
        ``zorder_by`` (Delta's ``OPTIMIZE ... WHERE ... ZORDER BY``):
        only the predicate's candidate files are re-clustered.
        ``incremental=True`` WITHOUT ``zorder_by`` raises — a plain
        bin-pack has no clustering anchor to be incremental against,
        and silently running the full bin-pack the caller asked to
        scope would be a lie.

        ``incremental=True`` (with ``zorder_by``) clusters ONLY the
        TAIL — files not yet present at the last ``zorder`` commit with
        the same columns (liquid-clustering's maintenance shape): the
        already-clustered base carries over by NAME with zero IO, the
        tail is rewritten clustered, and per-file stats are sharp on
        both old and new files, so pruning quality accrues while each
        maintenance pass costs only the data added since the previous
        one. The steady-state 100 TB pattern: hourly appends + a
        scheduled incremental cluster, never a full rewrite. Also
        composes with the commit-rebase protocol better than a full
        ZORDER: its read set is the tail alone, so it rebases over
        concurrent rewrites of base files instead of conflicting."""
        if zorder_by is not None:
            return self._compact_zorder(
                zorder_by, target_files, incremental=incremental,
                where=where,
            )
        if incremental:
            raise ValueError(
                f"{self.path}: compact(incremental=True) needs "
                f"zorder_by — a plain bin-pack has no clustering "
                f"anchor to be incremental against"
            )
        head = self.latest_version()
        # ``where`` = Delta's OPTIMIZE WHERE: only files whose stats MAY
        # match the predicate enter the bin-pack (zero IO to decide) —
        # scoped maintenance of a hot region without touching the rest.
        # On a checkpoint-anchored table the scope comes from a PARTIAL
        # snapshot (only candidates materialize driver-side); a plain
        # full-table bin-pack inherently needs every file's size and
        # keeps the full resolution.
        prev = None
        pre_pruned = False
        if where is not None:
            prev = self._manifest_pruned(head, where)
            pre_pruned = prev is not None
        if prev is None:
            prev = self._manifest(head)
        dv = prev.get("dv") or {}
        scope = prev["files"]
        if where is not None and not pre_pruned:
            schema = T.StructType.fromJson(json.loads(prev["schema"]))
            scope = prune_candidate_files(
                prev["files"], prev.get("stats") or {}, where,
                stat_cols=set(_stat_columns(schema)),
                rename=_physical_names(schema),
            )
        # a file carrying a deletion vector is ALWAYS rewritten (Delta's
        # REORG/PURGE folded into OPTIMIZE): the rewrite materializes
        # the mask and frees the read path from its anti-join
        small = [
            f
            for f in scope
            if f in dv or os.path.getsize(self._abs(f)) < max_file_bytes
        ]
        if len(small) < 2 and not any(f in dv for f in small):
            return prev["version"]
        hint = prev["version"] + 1
        schema = T.StructType.fromJson(json.loads(prev["schema"]))
        packed = self._write_files(
            self._scan(small, schema, dv).coalesce(1),
            hint,
            schema=schema,
        )
        return self._commit(
            "compact", add=packed, remove=small,
            schema_json=prev["schema"], version=hint,
            constraints=dict(prev.get("constraints") or {}),
            stats=self._collect_stats(packed, prev["schema"]),
            metrics={
                "files_compacted": len(small),
                "dv_purged": sum(1 for f in small if f in dv),
            },
            # read set = the compacted inputs only: OPTIMIZE rebases
            # freely over concurrent appends (Delta's does too) and
            # conflicts only when a writer removed/re-masked an input
            txn=self._txn(prev, read_files=small),
        )

    def _compact_zorder(
        self, zorder_by: list[str], target_files: int | None,
        incremental: bool = False, where: str | None = None,
    ) -> int:
        from cdk_datalake_ingest_upeu_spark.sources.files import zorder_value

        head = self.latest_version()
        # resolution ladder: predicate-pruned partial (where), header-
        # only partial + chain-derived tail (incremental — the
        # steady-state maintenance pass on a 10^6-file table resolves
        # ZERO full manifests: singletons and live-count from the
        # checkpoint footer, the tail and its masks from the delta
        # records since the last cluster), full manifest otherwise.
        prev = None
        pre_pruned = False
        header_only = False
        if where is not None:
            prev = self._manifest_pruned(head, where)
            pre_pruned = prev is not None
        if prev is None and incremental and where is None:
            prev = self._resolve_pruned(head, None)
            header_only = prev is not None
        if prev is None:
            prev = self._manifest(head)
        files_total = prev.get("n_files_total", len(prev["files"]))
        if files_total == 0:
            return prev["version"]
        hint = prev["version"] + 1
        schema = T.StructType.fromJson(json.loads(prev["schema"]))
        missing = [c for c in zorder_by if c not in schema.fieldNames()]
        if missing:
            raise ValueError(
                f"{self.path}: zorder_by columns {missing} not in table"
            )
        phys = _physical_names(schema)
        scope = list(prev["files"])
        if where is not None and not pre_pruned:
            # Delta's OPTIMIZE ... WHERE ZORDER BY: only files whose
            # manifest stats MAY match the predicate are re-clustered
            # (zero IO to decide); the cold rest carries over by name.
            # Composes with incremental below by intersection.
            scope = prune_candidate_files(
                scope, prev.get("stats") or {}, where,
                stat_cols=set(_stat_columns(schema)),
                rename=phys,
            )
        if where is not None and not scope:
            return prev["version"]
        anchor = None
        scan_dv = prev.get("dv")
        if incremental:
            # the tail = files absent from the snapshot of the last
            # zorder commit on the SAME columns — compared by PHYSICAL
            # name (stable across renames; matching logical names
            # could false-match a column renamed ONTO a previously
            # clustered name). A COW rewrite of a clustered file
            # re-enters the tail — it lost its layout. Finding the
            # anchor walks commit records newest-first: O(commits
            # since last cluster), tiny delta records only.
            want = [phys.get(c, c) for c in zorder_by]
            for v in reversed(self.versions()):
                rec = self._commit_record(v)
                met = rec.get("metrics") or {}
                if rec.get("op") == "zorder" and (
                    met.get("zorder_by_physical", met.get("zorder_by"))
                    == want
                ):
                    anchor = v
                    break
            delta = (
                self._chain_delta(anchor, head)
                if anchor is not None
                else None
            )
            if anchor is not None and delta is not None:
                # chain-derived tail: the files added since the anchor
                # and still live, with their chain-accumulated deletion
                # vectors — no anchor manifest materializes. Files in
                # BOTH delta lists were removed and re-added BY NAME
                # (consolidate_dv / restore resetting a mask): their
                # bytes — and layout — never changed, so they stay in
                # the clustered base exactly as the anchor-manifest
                # diff (`f not in base`) carried them; only a COW
                # rewrite (new file name) re-enters the tail.
                readded = set(delta["only0"])
                tail = [f for f in delta["only1"] if f not in readded]
                if header_only:
                    scope = tail
                    scan_dv = delta["dv1"]
                else:
                    tset = set(tail)
                    scope = [f for f in scope if f in tset]
            elif anchor is not None:
                # legacy snapshot mid-chain: the two-manifest diff
                if header_only:
                    prev = self._manifest(head)
                    header_only = False
                    scope = list(prev["files"])
                    scan_dv = prev.get("dv")
                base = set(self._manifest(anchor)["files"])
                scope = [f for f in scope if f not in base]
            elif header_only:
                # never clustered: incremental degenerates to the full
                # rewrite, which needs the full file list after all
                prev = self._manifest(head)
                header_only = False
                scope = list(prev["files"])
                scan_dv = prev.get("dv")
            if not scope:
                return prev["version"]
        cur = self._scan(scope, schema, scan_dv)
        # one column: Morton interleaving degenerates to a plain range
        # clustering on that column (Delta's ZORDER BY (c) likewise)
        z = (
            F.col(zorder_by[0])
            if len(zorder_by) == 1
            else zorder_value(cur, zorder_by)
        )
        clustered = cur.withColumn("__z", z)
        clustered = (
            clustered.repartitionByRange(target_files, "__z")
            if target_files
            else clustered.repartitionByRange("__z")
        )
        packed = self._write_files(
            clustered.sortWithinPartitions("__z").drop("__z"), hint,
            schema=schema,
        )
        return self._commit(
            "zorder", add=packed, remove=scope,
            schema_json=prev["schema"], version=hint,
            constraints=dict(prev.get("constraints") or {}),
            stats=self._collect_stats(packed, prev["schema"]),
            metrics={
                "zorder_by": list(zorder_by),
                # physical twin: anchors and eager-write clustering key
                # on THIS, so they survive renames and never
                # false-match a reused logical name
                "zorder_by_physical": [
                    phys.get(c, c) for c in zorder_by
                ],
                "files_clustered": len(scope),
                "files_carried": files_total - len(scope),
                "incremental": bool(incremental and anchor is not None),
            },
            # rebases over pure appends (the appended file simply stays
            # unclustered, like Delta OPTIMIZE); conflicts when a writer
            # removed/re-masked a file we re-clustered — for an
            # incremental pass that is the TAIL alone, so it also
            # rebases over concurrent rewrites of base files
            txn=self._txn(prev, read_files=scope),
        )

    def consolidate_dv(self) -> int:
        """Merge every accumulated deletion-vector sidecar into ONE new
        sidecar — data files untouched (Delta compacts DV files the
        same way, separately from rewriting data). A takedown-heavy
        table accretes one tiny sidecar per DV delete; each read's mask
        arm must open all of them. Consolidation reads the masked
        positions once, writes them as a single file, and commits a
        zero-data-IO record that RESETS each masked file's sidecar list
        (the same remove+add-of-the-shared-file mechanism restore uses
        — a plain union could only grow the list). Old sidecars are
        reclaimed by :meth:`vacuum` once no retained version references
        them. Returns the new version, or the current one when there is
        nothing to consolidate (zero or one sidecar)."""
        prev = self._manifest(self.latest_version())
        dv = prev.get("dv") or {}
        all_sidecars = sorted({s for lst in dv.values() for s in lst})
        if len(all_sidecars) < 2:
            return prev["version"]
        hint = prev["version"] + 1
        # decode -> distinct -> re-encode: merging at POSITION level
        # fuses runs that were split across sidecars (and dedups any
        # overlap), so the consolidated sidecar is maximal-run-length
        # within the encoder's cap-aligned chunks
        merged = self._write_files(
            self._encode_dv_runs(
                self._dv_sidecar_rows(all_sidecars).distinct()
            ).coalesce(1),
            hint,
        )
        files = sorted(dv)
        target_stats = prev.get("stats") or {}
        return self._commit(
            "consolidate_dv",
            add=files,
            remove=files,
            schema_json=prev["schema"],
            version=hint,
            constraints=dict(prev.get("constraints") or {}),
            stats={f: target_stats[f] for f in files if f in target_stats},
            dv={f: merged for f in files},
            metrics={
                "sidecars_before": len(all_sidecars),
                "sidecars_after": len(merged),
                "dv_files": len(files),
            },
            # read set = the masked files whose sidecar lists we reset:
            # rebases over appends and unrelated rewrites; conflicts if
            # a writer removed or re-masked any of them
            txn=self._txn(prev, read_files=files),
        )

    def vacuum(
        self, retain_last: int = 1, *, tmp_grace_seconds: float = 3600.0,
        data_grace_seconds: float = 3600.0,
    ) -> dict:
        """Drop manifests older than the newest ``retain_last`` versions
        and every data file no retained manifest references — Delta's
        VACUUM with a version-count retention (Delta's is time-based;
        version count is the deterministic twin for tests). Returns
        ``{"versions_dropped": [...], "files_deleted": n}``. Vacuumed
        versions subsequently raise :class:`VersionNotFoundError` on
        read, exactly like Delta past its retention window. Also sweeps
        ``.tmp-*`` orphans in ``_log/`` older than
        ``tmp_grace_seconds`` — a writer that died between its temp
        write and the atomic link leaves one behind; readers already
        ignore them, vacuum is what reclaims them (the grace period
        protects an IN-FLIGHT commit's temp file from a concurrent
        vacuum).

        ``data_grace_seconds`` is the same protection for DATA files:
        a commit in flight on another writer has already written its
        parquet but not yet linked its record, so those files look
        unreferenced — exactly like the orphans a raced/conflicted
        commit leaves behind for vacuum to reclaim. Only unreferenced
        files whose mtime is older than the grace are deleted (Delta's
        VACUUM retention plays this role; its default is 7 days). The
        default (one hour, matching ``tmp_grace_seconds``) is
        deliberately conservative: a default-arg vacuum racing a
        concurrent writer must never delete parquet that writer has
        produced but not yet linked — that would publish a manifest
        referencing missing files, silent data loss. Deterministic
        single-writer tests pass ``0.0`` explicitly to reclaim
        immediately; with slow CONCURRENT writers set it beyond the
        longest expected commit duration."""
        vs = self.versions()
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        # tagged versions are retained regardless of the count —
        # Iceberg's tag-retention rule: a named ref is a durable anchor
        keep = set(vs[-retain_last:]) | set(self.tags().values())
        referenced: set[str] = set()
        for v in keep:
            snap = self._manifest(v)
            referenced.update(snap["files"])
            # deletion-vector sidecars are data too: a retained version
            # whose mask got deleted would silently resurrect rows
            for sidecars in (snap.get("dv") or {}).values():
                referenced.update(sidecars)
        # before dropping any record, every KEPT version must remain
        # resolvable from the surviving log alone: a kept version whose
        # resolution chain crosses a dropped record gets its own
        # checkpoint first (Delta's retention works the same way — the
        # checkpoint is what lets old log segments be deleted)
        have_cp = set(self.checkpoints())

        def _resolves_after_drop(v: int) -> bool:
            if "files" in self._commit_record(v):
                return True  # legacy snapshot record: self-contained
            anchors = sorted(
                (c for c in have_cp if c <= v and c in keep), reverse=True
            )
            for c in anchors:
                chain = [u for u in vs if c < u <= v]
                if chain == list(range(c + 1, v + 1)) and all(
                    u in keep for u in chain
                ):
                    return True
            # from genesis: the full contiguous 0..v chain must survive
            pre = [u for u in vs if u <= v]
            return pre == list(range(v + 1)) and all(u in keep for u in pre)

        for v in sorted(keep):
            if v in vs and not _resolves_after_drop(v):
                self._write_checkpoint(v)
                have_cp.add(v)
        import time as _time

        data_cutoff = _time.time() - data_grace_seconds
        deleted = 0
        if os.path.isdir(self.data_dir):
            for sub in sorted(os.listdir(self.data_dir)):
                subdir = os.path.join(self.data_dir, sub)
                for fn in sorted(os.listdir(subdir)):
                    rel = os.path.join("data", sub, fn)
                    p = os.path.join(subdir, fn)
                    if (
                        fn.endswith(".parquet")
                        and rel not in referenced
                        and os.path.getmtime(p) <= data_cutoff
                    ):
                        os.remove(p)
                        deleted += 1
                        crc = os.path.join(subdir, f".{fn}.crc")
                        # Spark's local-FS committer writes .crc siblings
                        if os.path.exists(crc):
                            os.remove(crc)
                if not any(
                    f.endswith(".parquet") for f in os.listdir(subdir)
                ):
                    shutil.rmtree(subdir)
        dropped = [v for v in vs if v not in keep]
        for v in dropped:
            os.remove(os.path.join(self.log_dir, f"{v:08d}.json"))
        # checkpoints of dropped versions are unreachable (their record
        # is gone, so the version itself reads as not-found)
        dropped_set = set(dropped)
        for f in os.listdir(self.log_dir):
            if _CHECKPOINT_RE.fullmatch(f) and int(f[:8]) in dropped_set:
                os.remove(os.path.join(self.log_dir, f))
        # stale .tmp-* orphans from crashed writers
        cutoff = _time.time() - tmp_grace_seconds
        for f in os.listdir(self.log_dir):
            p = os.path.join(self.log_dir, f)
            if _TMP_RE.fullmatch(f) and os.path.getmtime(p) <= cutoff:
                os.remove(p)
        # dropped versions must now raise on read — flush the memo
        self._snapshot_cache.clear()
        self._pruned_cache.clear()
        return {"versions_dropped": dropped, "files_deleted": deleted}

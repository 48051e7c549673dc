"""Join helpers for scale: skew salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
explicit, planner-independent tool for the pathological case — a handful
of hot keys owning a large fraction of a 100 TB fact table — and for
aggregations, where AQE does not split hot groupBy keys.

``salted_join``: the skewed (large) side gets a per-row salt in
``[0, buckets)``; the other side is replicated ``buckets`` times with
every salt value; the join key becomes (key, salt), spreading each hot
key over ``buckets`` shuffle partitions. Replication multiplies the
small side by ``buckets`` — use only when the small side times buckets
still fits comfortably per executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    *,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``buckets``
    shuffle partitions.

    Result equals ``skewed.join(other, on, how)`` for inner/left joins
    (``other`` must be unique per key for left joins to avoid inflating
    matches — same contract as the plain join).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")

    # deterministic per-row salt: hash of the whole row spreads rows of
    # the same key uniformly without RNG (safe under task retries)
    salted = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(buckets))
    )
    replicated = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i).cast("long") for i in range(buckets)]))
    )
    out = salted.join(replicated, keys + [_SALT], how)
    return out.drop(_SALT)


def skew_stats(df: DataFrame, key: str | list[str], top: int = 10) -> DataFrame:
    """Per-key row counts + share of total, descending — the diagnostic
    you run before deciding a key needs salting. One action: the total
    comes from a window sum over the per-key aggregate (tiny relation),
    not a second scan of the input."""
    keys = [key] if isinstance(key, str) else list(key)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = F.sum("n_rows").over(Window.partitionBy())
    return (
        counts.withColumn("share", F.round(F.col("n_rows") / total, 6))
        .orderBy(F.col("n_rows").desc())
        .limit(top)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single most recent right row
    with right_time <= left_time (direction='backward'; 'forward' takes
    the earliest right row with right_time >= left_time), matched per
    key. ``tolerance`` (a SQL interval string, e.g. ``'1 hours'``)
    additionally bounds the match the way pandas ``merge_asof`` does:
    a backward match older than ``left_time - tolerance`` (or a forward
    match beyond ``left_time + tolerance``) is discarded — the left row
    keeps NULL payload. Requires timestamp-typed time columns. Right payload columns whose names collide with left columns are
    renamed ``<name><suffix>`` in the output (a double collision raises).
    Spark has no native ASOF JOIN; the classic scalable encoding is
    union + ordered window:

      union both sides tagged by origin, sort within each key by time,
      carry the latest right payload forward with last_value(ignorenulls)
      over (partition by key order by time), keep left rows.

    ONE shuffle on the key columns, no range-explosion, no per-row
    probing — cost is a sort within key groups, same as any window. This
    beats the naive inequality-join (which Catalyst can only plan as a
    broadcast nested loop) at any scale where the right side isn't tiny.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_time]

    # uniquify right payload names that collide with left output columns
    left_cols = set(left.columns)
    out_name = {}
    for c in payload:
        name = f"{c}{suffix}" if c in left_cols else c
        if name != c and (name in left_cols or name in payload):
            raise ValueError(
                f"asof_join: right column {c!r} collides with a left column "
                f"and the suffixed name {name!r} collides too - rename inputs"
            )
        out_name[c] = name

    lt = F.col(left_time)
    # The right payload rides as ONE struct, not per-column slots: the
    # carry below uses last(..., ignorenulls=True), and with independent
    # columns a genuinely-NULL field in the true match row would be
    # backfilled from an OLDER right row while its siblings come from
    # the newer one — a torn row (caught by the hostile-NULLs
    # perturbation sweep). The struct is non-null for every right row
    # even when all its fields are null, so the carry is all-or-nothing.
    from pyspark.sql import types as T

    # '__rt' is injected into the payload struct UNCONDITIONALLY (the
    # tolerance check reads it when present) — with tolerance=None a
    # right payload column of that name would duplicate the struct field
    # and __c.__rt would silently resolve to the match time instead of
    # the payload value, so the reservation holds regardless of tolerance
    if "__rt" in payload:
        raise ValueError("asof_join: right column name '__rt' is reserved")
    # the matched row's own time rides in the struct so the tolerance
    # check applies to the TRUE match, not a per-column backfill
    r_struct_type = T.StructType(
        [T.StructField("__rt", right.schema[right_time].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in payload]
    )
    l_tagged = left.select(
        *keys,
        lt.alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in keys],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c).alias(c) for c in payload],
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort BEFORE left rows at equal time so an exact-time
        # match is visible to the left row
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    carried = unioned.select(
        "*",
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__c"),
    )
    if tolerance is not None:
        if direction == "backward":
            within = F.col("__c.__rt") >= F.expr(
                f"__t - INTERVAL {tolerance}"
            )
        else:
            within = F.col("__c.__rt") <= F.expr(
                f"__t + INTERVAL {tolerance}"
            )
        carried = carried.withColumn(
            "__c", F.when(within, F.col("__c"))
        )
    out = carried.filter(F.col("__is_left") == 1).select(
        *keys,
        F.col("__t").alias(left_time),
        *[F.col(c) for c in left.columns if c not in keys and c != left_time],
        *[F.col(f"__c.{c}").alias(out_name[c]) for c in payload],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    *,
    lower: str = "-1 hours",
    upper: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Interval (range) join: pair each left row with the right rows
    sharing its key whose ``right_time`` lies in
    ``[left_time + lower, left_time + upper]`` (bounds are SQL interval
    strings, inclusive).

    Scale shape: ONE shuffle on the equality keys — the range predicate
    rides along as a join condition evaluated inside the same sort-merge
    pass, never as a post-join filter over an exploded product. On
    STREAMING inputs this is Spark's stream-stream join: give both
    sides a watermark and the time bounds let the state store evict
    rows older than ``watermark + |lower|`` (without the bounds the
    join state would grow forever).

    The reference has no range join (its extracts are point/range
    predicates pushed to the source DB — ``extract_data_spark.py``
    BETWEEN filters); this is the Spark-native generalization. Key
    columns are coalesced; all non-key names must be disjoint between
    the two sides (raise early rather than silently shadow).
    """
    keys = [on] if isinstance(on, str) else list(on)
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"interval_join requires disjoint non-key columns; rename {sorted(clash)}"
        )
    # qualified aliases so both sides may derive from the SAME source
    # relation (the common case: two event-type slices of one table)
    la, ra = left.alias("__ij_l"), right.alias("__ij_r")
    lcol = lambda c: F.col(f"__ij_l.{c}")  # noqa: E731
    rcol = lambda c: F.col(f"__ij_r.{c}")  # noqa: E731
    cond = None
    for k in keys:
        c = lcol(k) == rcol(k)
        cond = c if cond is None else cond & c
    lo = lcol(left_time) + F.expr(f"INTERVAL {lower}")
    hi = lcol(left_time) + F.expr(f"INTERVAL {upper}")
    cond = cond & (rcol(right_time) >= lo) & (rcol(right_time) <= hi)
    joined = la.join(ra, cond, how)
    # single output column per key (both sides carry it post-join;
    # coalesce keeps outer-join rows keyed)
    out = joined.select(
        *[F.coalesce(lcol(k), rcol(k)).alias(k) for k in keys],
        *[lcol(c) for c in left.columns if c not in keys],
        *[rcol(c) for c in right.columns if c not in keys],
    )
    return out

"""Slowly-changing-dimension type-2 history over a changelog.

The reference's stage zone keeps only CURRENT state: the Delta MERGE in
light_transform.py:1363-1409 upserts the latest row per business key and
discards the previous version. A warehouse consuming that lake almost
always also wants the HISTORY — "what was this customer's segment when
the order shipped" — i.e. SCD type-2 rows with validity intervals.

Two operators:

- :func:`scd2_history` — rebuild the full type-2 history from a
  changelog (key, ts, tracked attributes): collapse consecutive
  identical-attribute rows into version runs, stamp each run with
  ``valid_from`` / ``valid_to`` / ``is_current``.
- :func:`scd2_upsert` — incrementally merge a new snapshot batch into
  an existing type-2 dimension: close out current rows whose attributes
  changed, append the new versions (the streaming-merge counterpart of
  the rebuild).

Scale shape: :func:`scd2_history` is two window passes over the SAME
``partitionBy(key) orderBy(ts)`` spec, so Catalyst plans ONE exchange +
one sort and reuses them for both windows — no groupBy, no second
shuffle. :func:`scd2_upsert` is one shuffle on the key (the join), with
attribute equality decided by a 64-bit ``xxhash64`` so the exchange
carries 8 bytes of payload per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_list(cols: str | list[str]) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def scd2_history(
    df: DataFrame,
    key_cols: str | list[str],
    attr_cols: str | list[str],
    ts_col: str,
    tiebreak_cols: str | list[str] | None = None,
) -> DataFrame:
    """Collapse a changelog into SCD2 version rows.

    Input: one row per observed state ``(key, ts, attrs...)``.  Output:
    one row per version RUN — maximal span of consecutive observations
    (per key, ordered by ``ts`` then ``tiebreak_cols``) whose tracked
    attributes are all unchanged — with columns ``key..., attrs...,
    valid_from`` (first ts of the run), ``valid_to`` (start of the next
    run; NULL while current) and ``is_current``.

    NULL-safe: an attribute flipping NULL -> value (or back) starts a
    new version (eqNullSafe comparison against the lagged row).
    """
    keys = _as_list(key_cols)
    attrs = _as_list(attr_cols)
    ties = _as_list(tiebreak_cols) if tiebreak_cols else []
    order = [F.col(ts_col), *[F.col(t) for t in ties]]
    w = Window.partitionBy(*keys).orderBy(*order)

    unchanged = F.lit(True)
    for a in attrs:
        unchanged = unchanged & F.col(a).eqNullSafe(F.lag(a).over(w))
    starts = df.withColumn("__start", ~unchanged | F.lag(ts_col).over(w).isNull())

    # Keep only run-start rows; their ts IS valid_from, and the next
    # start's ts (same window spec => exchange/sort reuse) is valid_to.
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        starts.filter(F.col("__start"))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(
            *keys,
            *attrs,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def scd2_upsert(
    dim: DataFrame,
    batch: DataFrame,
    key_cols: str | list[str],
    attr_cols: str | list[str],
    batch_ts_col: str,
) -> DataFrame:
    """Merge a new snapshot ``batch`` (one row per key: its state at
    ``batch_ts_col``) into an SCD2 ``dim`` produced by
    :func:`scd2_history` (columns ``key..., attrs..., valid_from,
    valid_to, is_current``).

    Semantics per key in the batch:

    - key unknown to ``dim``      -> append a new current version
    - attrs equal current version -> no change
    - attrs differ                -> close the current row
      (``valid_to = batch ts``) and append the new current version

    Historical (non-current) rows pass through untouched.  Returns the
    merged dimension with the same schema as ``dim``.
    """
    keys = _as_list(key_cols)
    attrs = _as_list(attr_cols)

    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    b = batch.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        *[F.col(a).alias(f"__ba_{a}") for a in attrs],
        F.col(batch_ts_col).alias("__bts"),
        F.xxhash64(*attrs).alias("__bh"),
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__bk_{k}"))
        cond = c if cond is None else cond & c
    # full_outer (batch keys may be brand-new) — broadcast-hash can't do
    # full outer, so this is one sort-merge shuffle on the key; the hash
    # payload keeps the exchange narrow.
    j = cur.withColumn("__ch", F.xxhash64(*attrs)).join(b, cond, "full_outer")

    changed = F.col("__bh").isNotNull() & (
        F.col("__ch").isNull() | (F.col("__ch") != F.col("__bh"))
    )
    # surviving current rows: unchanged ones keep their row; changed /
    # brand-new keys take the batch's attributes and ts
    kept = j.filter(~changed & F.col("__ch").isNotNull()).select(dim.columns)
    closed = (
        j.filter(changed & F.col("__ch").isNotNull())
        .withColumn("valid_to", F.col("__bts"))
        .withColumn("is_current", F.lit(False))
        .select(dim.columns)
    )
    opened = j.filter(changed).select(
        *[F.coalesce(F.col(k), F.col(f"__bk_{k}")).alias(k) for k in keys],
        *[F.col(f"__ba_{a}").alias(a) for a in attrs],
        F.col("__bts").alias("valid_from"),
        F.lit(None).cast(dict(dim.dtypes)["valid_to"]).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.unionByName(kept).unionByName(closed).unionByName(opened)


def scd2_point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (as-of) join of facts onto an SCD2 history: each
    fact row picks up the dimension version whose validity interval
    contains its timestamp (``valid_from <= ts < valid_to``, open
    current versions match everything at or after their start). Facts
    preceding the key's first version keep NULL attributes under the
    default left join — the honest answer, not a silent drop.

    Scale shape: the join keys on the DIMENSION KEY equality (one
    exchange per side, or none if the history rides a broadcast — it
    is version-count-sized, not fact-sized); the interval test rides
    INSIDE the keyed join as a residual predicate, so there is no range
    explosion — each fact matches at most one version by construction
    (SCD2 intervals per key are disjoint). The classic wrong plan — a
    theta-join on the range alone — is O(facts x versions); this is
    the same bounds-in-the-key-join shape as operators/joins.py
    interval_join.
    """
    keys = _as_list(key_cols)
    h = history.alias("h")
    f = facts.alias("f")
    cond = None
    for k in keys:
        eq = F.col(f"f.{k}") == F.col(f"h.{k}")
        cond = eq if cond is None else cond & eq
    ts = F.col(f"f.{ts_col}")
    cond = (
        cond
        & (ts >= F.col(f"h.{valid_from}"))
        & (F.col(f"h.{valid_to}").isNull() | (ts < F.col(f"h.{valid_to}")))
    )
    hist_cols = [
        F.col(f"h.{c}") for c in history.columns if c not in keys
    ]
    return f.join(h, cond, how).select(
        *[F.col(f"f.{c}") for c in facts.columns], *hist_cols
    )

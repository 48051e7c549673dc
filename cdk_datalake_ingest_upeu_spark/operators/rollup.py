"""Incremental materialized-rollup maintenance (additive MERGE).

The reference recomputes every aggregate from the full stage table on
each load (its Athena/Glue consumers re-scan). At 100 TB that is the
single biggest recurring cost in a lakehouse: a daily rollup over a
year of history re-reads 365 partitions to refresh one. The scale
answer is the standard materialized-view maintenance trick — keep the
rollup in RE-AGGREGATABLE form (count / sum / min / max; avg = sum /
count at read time) so a new batch contributes a KB-scale PARTIAL that
merges ADDITIVELY into the stored rollup. History is never re-read:
each refresh costs one scan of the new batch plus a join against the
(group-count-sized) rollup table.

Non-reaggregatable metrics (exact distinct, exact quantiles) need
mergeable sketches instead — that path already exists
(operators/sketches.py daily_sketches/rollup_sketches); this module is
the exact-arithmetic complement for the algebraic aggregates.

Delta note: with delta-spark installed, ``additive_merge`` is ONE
``MERGE ... WHEN MATCHED UPDATE SET n = t.n + s.n`` statement; on the
plain-parquet path it is the same full-outer-join + coalesce rewrite
the stage writer's MERGE already pays for (operators/stage_writer.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metric-column suffix conventions produced by rollup_partial
_ADDITIVE = ("n_rows", "sum_")
_MIN = "min_"
_MAX = "max_"


def rollup_partial(
    batch: DataFrame,
    keys: list[str],
    *,
    sum_cols: dict[str, str] | None = None,
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Aggregate one batch into the mergeable-partial form.

    ``sum_cols`` maps output name -> source expression; sums MUST be
    exact types (cast doubles to decimal first — a float sum is neither
    order- nor merge-stable). Output columns: keys, ``n_rows``,
    ``sum_<name>``, ``min_<name>``, ``max_<name>``.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, expr in (sum_cols or {}).items():
        aggs.append(F.sum(F.expr(expr)).alias(f"sum_{name}"))
    for name, expr in (min_cols or {}).items():
        aggs.append(F.min(F.expr(expr)).alias(f"min_{name}"))
    for name, expr in (max_cols or {}).items():
        aggs.append(F.max(F.expr(expr)).alias(f"max_{name}"))
    return batch.groupBy(*keys).agg(*aggs)


def additive_merge(
    rollup: DataFrame | None, partial: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge a new partial into the stored rollup: counts and sums ADD,
    mins/maxes fold, unseen groups insert. ``rollup=None`` (first load)
    returns the partial unchanged. Cost: one full-outer join keyed on
    the GROUP columns — both sides are rollup-sized (group count), not
    corpus-sized."""
    if rollup is None:
        return partial
    if set(rollup.columns) != set(partial.columns):
        raise ValueError(
            f"rollup schema drift: stored {sorted(rollup.columns)} vs "
            f"partial {sorted(partial.columns)}"
        )
    r, p = rollup.alias("r"), partial.alias("p")
    cond = None
    for k in keys:
        eq = F.col(f"r.{k}").eqNullSafe(F.col(f"p.{k}"))
        cond = eq if cond is None else cond & eq
    joined = r.join(p, cond, "full_outer")
    out = [
        F.coalesce(F.col(f"r.{k}"), F.col(f"p.{k}")).alias(k) for k in keys
    ]
    for c in rollup.columns:
        if c in keys:
            continue
        rc, pc = F.col(f"r.{c}"), F.col(f"p.{c}")
        if c == "n_rows" or c.startswith("sum_"):
            out.append((F.coalesce(rc, F.lit(0)) + F.coalesce(pc, F.lit(0))).alias(c))
        elif c.startswith(_MIN):
            out.append(F.least(rc, pc).alias(c))  # least/greatest skip NULLs
        elif c.startswith(_MAX):
            out.append(F.greatest(rc, pc).alias(c))
        else:
            raise ValueError(
                f"column {c!r} is not re-aggregatable (expected n_rows / "
                "sum_* / min_* / max_*); use a mergeable sketch for it"
            )
    return joined.select(*out)

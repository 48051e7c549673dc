"""Fused driver actions: run several independent KB-scale aggregates
as ONE Spark job whose branches overlap (guide §1.2/§2.6 applied at
the plan level — k serial ``.count()``/``.first()`` calls pay k job
launches for work the scheduler could overlap).

Phase discipline (measured in r15 on forget_everywhere, 16.4 → 35.3 s
when ignored): branches that share a NOT-YET-MATERIALIZED persisted
subtree race — each branch recomputes the persist concurrently before
any caches it. Materialize shared persists in a prior action (or a
prior fused phase whose branches touch disjoint persists), then fuse
the audits."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_counts(frames: list[tuple[str, DataFrame]]) -> dict[str, int]:
    """Count several DataFrames in ONE Spark action: each frame reduces
    to a labelled 1-row count and the union executes as a single job.
    ``frames`` is [(label, df), ...]; returns {label: count}."""
    labels = [lbl for lbl, _ in frames]
    assert len(set(labels)) == len(labels), (
        f"union_counts labels must be unique, got {labels}"
    )
    out = None
    for lbl, df in frames:
        c = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(lbl).alias("k"), "n"
        )
        out = c if out is None else out.unionByName(c)
    return {r["k"]: r["n"] for r in out.collect()}


def union_scalars(frames: list[tuple[str, DataFrame]]) -> dict:
    """Collect several 1-row single-column aggregates in ONE action.
    ``frames`` is [(label, one_row_df)] where each df is already an
    aggregate (e.g. ``df.agg(F.max(...))``) with exactly one column;
    returns {label: value} (value may be None for empty aggregates).
    The single-row contract is the caller's: a global aggregate always
    yields exactly one row."""
    labels = [lbl for lbl, _ in frames]
    assert len(set(labels)) == len(labels), (
        f"union_scalars labels must be unique, got {labels}"
    )
    out = None
    for lbl, df in frames:
        assert len(df.columns) == 1, (
            f"union_scalars frame {lbl!r} must have exactly one column, "
            f"got {df.columns}"
        )
        c = df.select(
            F.lit(lbl).alias("k"), F.col(df.columns[0]).alias("v")
        )
        out = c if out is None else out.unionByName(c)
    return {r["k"]: r["v"] for r in out.collect()}

"""Session-scoped scratch-persist tracking.

Several operators persist an intermediate relation that is scanned more
than once inside the single plan they return (signature passes,
inverted indexes, staged shingle tables).  ``DataFrame.persist`` pins
those relations in the executor block manager until explicitly
unpersisted — and a long-lived session running many queries (the
bench, the driver's correctness sweep) accumulates them until memory
pressure evicts hot data (measured in round 2: ``ann_topk_bruteforce``
0.67 s -> 4.16 s with unchanged code, purely from predecessors' leaked
cache).

Operators therefore persist through :func:`scratch_persist`, and query
wrappers call :func:`finalize` on their result: the result is
materialized once (``localCheckpoint`` truncates the lineage so the
scratch relations are no longer referenced by the returned plan), then
every tracked relation is unpersisted.  Library users composing
operators directly can instead call :func:`release_scratch` at their
own batch boundaries — the operators' laziness is unchanged; only the
harness wrappers force materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCRATCH: list[DataFrame] = []


def scratch_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` plus registration for later release."""
    out = df.persist()
    _SCRATCH.append(out)
    return out


def release_scratch() -> None:
    """Unpersist every tracked scratch relation (idempotent)."""
    while _SCRATCH:
        _SCRATCH.pop().unpersist()


def finalize(result: DataFrame) -> DataFrame:
    """Materialize ``result`` eagerly and release all scratch persists.

    ``localCheckpoint(eager=True)`` computes the (small — pairs/stats)
    result once and swaps the lineage for the stored partitions, so
    unpersisting the scratch inputs afterwards cannot trigger a
    recompute.  The checkpointed partitions themselves are reclaimed by
    the ContextCleaner when the returned DataFrame is garbage
    collected, unlike cache entries which live until unpersist.
    """
    out = result.localCheckpoint(eager=True)
    release_scratch()
    return out

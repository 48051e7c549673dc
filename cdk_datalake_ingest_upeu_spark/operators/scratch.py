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

import threading

from pyspark.sql import DataFrame

# Per-thread registry: the pipeline driver fans queries out on a thread
# pool, and a process-global list would let one thread's finalize()
# unpersist another thread's scratch relations mid-flight.  Within one
# thread the contract is build-then-finalize sequentially: finalize()
# releases EVERYTHING the thread has registered, so interleaving the
# construction of two plans before finalizing either releases the first
# plan's scratch early (a recompute cost, not a correctness bug).
_LOCAL = threading.local()


def _frames() -> list[DataFrame]:
    frames = getattr(_LOCAL, "frames", None)
    if frames is None:
        frames = _LOCAL.frames = []
    return frames


def scratch_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` plus registration for later release (on the
    calling thread's registry — see module note)."""
    out = df.persist()
    _frames().append(out)
    return out


def release_scratch() -> None:
    """Unpersist every scratch relation tracked by THIS thread
    (idempotent)."""
    frames = _frames()
    while frames:
        frames.pop().unpersist()


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

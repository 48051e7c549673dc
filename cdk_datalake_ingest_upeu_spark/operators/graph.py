"""Domain-graph ranking — integer-exact PageRank over an aggregated
edge table.

Two graph grains appear in a lake, and they need different execution
shapes:

- **ID-grain graphs** (document near-dup pairs, user follows): nodes
  scale with the corpus. Iteration must stay distributed —
  ``operators/dedup.connected_components`` is this engine's pattern
  (bounded label propagation with localCheckpoint truncation).
- **Domain-grain graphs** (event-type transitions, category
  co-occurrence): nodes are a *vocabulary*, K in the tens-to-thousands,
  while the EDGE EVIDENCE is corpus-sized. The right split is: build
  the weighted edge aggregate distributed (scan + one shuffle, the
  100 TB cost), then iterate on the K-node graph driver-side — the same
  envelope as k-means centroids (``operators/clustering.py``), KB of
  state, zero per-iteration shuffles.

Both operators enforce that envelope with a loud-failure gate: a
bounded ``limit(max_edges + 1).count()`` before any ``collect()``, so
passing an ID-grain pair table raises a named error instead of silently
attempting a driver OOM (the same contract style as SemDeDup's
``max_pair_work_factor``).

Determinism: ranks are integers at a fixed scale, updated as

    r'(v) = teleport + sum_u (85 * r(u) * w(u,v)) div (100 * outw(u))

with integer floor-division — every engine computes identical values
(the repo-wide fixed-point convention, ``functions/stable.py``), so the
result is hash-comparable against an oracle that unrolls the same
iterations in SQL. Dangling-node mass (nodes with no out-edges) is
dropped, a documented PageRank variant choice; a source whose
aggregated out-weight is zero is likewise treated as dangling (it can
push no mass) rather than dividing by zero. Overflow envelope: total
rank mass is bounded by n_nodes * scale, so the product
``85 * r * w`` needs ``85 * n * scale * max_w < 2^63`` — at the default
scale 1e9 that allows vocabulary*weight products up to ~1e8, far past
any domain graph; for larger weights pre-normalize w/outw to a fixed
scale first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from cdk_datalake_ingest_upeu_spark.functions.localrel import rows_df as _rows_df


class EdgeTableTooLargeError(ValueError):
    """The edge table exceeds the domain-grain envelope these operators
    collect to the driver. Aggregate to domain grain first (groupBy
    (src, dst) with a summed weight) — or use the distributed ID-grain
    path (``operators/dedup.connected_components``) instead."""


def _gated_collect(edges: DataFrame, cols: list, max_edges: int) -> list:
    """Collect ``edges`` only after proving it is domain-grain sized.

    The gate is a bounded ``limit(max_edges + 1).count()`` — at most
    max_edges + 1 rows are ever counted, so the gate itself is cheap
    even when the input is a corpus-sized pair table about to be
    rejected."""
    if max_edges < 1:
        raise ValueError("max_edges must be >= 1")
    probe = edges.select(*cols).limit(max_edges + 1).count()
    if probe > max_edges:
        raise EdgeTableTooLargeError(
            f"edge table has > {max_edges} rows — this operator collects "
            f"the AGGREGATED domain graph (K nodes, <= K^2 rows) to the "
            f"driver; aggregate to domain grain first (groupBy src, dst) "
            f"or raise max_edges explicitly if the vocabulary really is "
            f"this large"
        )
    return edges.select(*cols).collect()


def domain_pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 3,
    scale: int = 10**9,
    damping_pct: int = 85,
    max_edges: int = 1_000_000,
) -> DataFrame:
    """Weighted PageRank over an already-aggregated domain edge table.

    ``edges`` must be the AGGREGATED graph — one row per (src, dst) with
    an integer weight; K nodes imply at most K^2 rows, which is the
    bounded, KB-scale object this collects (never the corpus that
    produced it). The ``max_edges`` gate enforces that precondition
    loudly (:class:`EdgeTableTooLargeError`) before any collect.
    Negative weights are rejected; a source whose weights sum to zero is
    dangling (pushes no mass) instead of dividing by zero. Returns
    (node, pr_scaled) with pr_scaled the integer rank at ``scale``.
    """
    rows = _gated_collect(edges, [src, dst, weight], max_edges)
    nodes = sorted(
        {r[0] for r in rows} | {r[1] for r in rows}
    )
    if not nodes:
        return _rows_df(edges.sparkSession, 
            [], "node string, pr_scaled long"
        )
    outw: dict = {}
    for r in rows:
        if int(r[2]) < 0:
            raise ValueError(
                f"negative edge weight {r[2]} on ({r[0]!r} -> {r[1]!r}); "
                f"PageRank weights must be non-negative"
            )
        outw[r[0]] = outw.get(r[0], 0) + int(r[2])
    teleport = (100 - damping_pct) * scale // 100
    rank = {v: scale for v in nodes}
    for _ in range(iterations):
        nxt = {v: teleport for v in nodes}
        for r in rows:
            if outw[r[0]] == 0:
                continue  # zero-outweight source: dangling, no mass out
            nxt[r[1]] += (damping_pct * rank[r[0]] * int(r[2])) // (
                100 * outw[r[0]]
            )
        rank = nxt
    out = [(v, rank[v]) for v in nodes]
    return _rows_df(edges.sparkSession, 
        out, "node string, pr_scaled long"
    )


def domain_reach(
    edges: DataFrame,
    sources: list,
    *,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    max_edges: int = 1_000_000,
) -> DataFrame:
    """Multi-source BFS hop distances over an aggregated domain edge
    table — min-plus relaxation on the K-node graph (same envelope as
    :func:`domain_pagerank`: the corpus-scale work is building
    ``edges``; iteration runs on KB of driver state, and the same
    ``max_edges`` gate rejects an ID-grain pair table loudly). Returns
    (node, hops) for every node within ``max_hops`` of any source —
    exact small integers, so an oracle reproduces them by unrolling
    the same relaxation rounds in SQL. Unreachable nodes are absent."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    adj: dict = {}
    for r in _gated_collect(edges, [src, dst], max_edges):
        adj.setdefault(r[0], set()).add(r[1])
    known = {s for s in sources}
    hops = {s: 0 for s in sources}
    frontier = set(hops)
    for h in range(1, max_hops + 1):
        nxt = set()
        for v in frontier:
            for w in adj.get(v, ()):
                if w not in known:
                    known.add(w)
                    hops[w] = h
                    nxt.add(w)
        if not nxt:
            break
        frontier = nxt
    out = sorted(hops.items())
    if not out:
        return _rows_df(edges.sparkSession, [], "node string, hops int")
    return _rows_df(edges.sparkSession, out, "node string, hops int")

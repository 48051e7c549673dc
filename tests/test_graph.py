"""domain_pagerank: integer determinism, teleport floor, dangling mass."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.graph import (
    domain_pagerank,
    domain_reach,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w long")


def test_symmetric_two_cycle_is_uniform(spark):
    # a <-> b with equal weights: ranks must stay exactly equal
    df = domain_pagerank(_edges(spark, [("a", "b", 3), ("b", "a", 3)]))
    got = {r.node: r.pr_scaled for r in df.collect()}
    assert got["a"] == got["b"]
    # conserved mass (no dangling nodes): teleport + damped total
    assert got["a"] == 10**9  # fixed point of the symmetric graph


def test_sink_receives_more_than_source(spark):
    # a -> b only: b accumulates a's damped mass; a keeps teleport-only
    df = domain_pagerank(_edges(spark, [("a", "b", 1)]), iterations=1)
    got = {r.node: r.pr_scaled for r in df.collect()}
    assert got["a"] == 150_000_000  # teleport floor, no in-edges
    # b = teleport + 85% of a's initial rank (b is dangling: mass dropped)
    assert got["b"] == 150_000_000 + (85 * 10**9) // 100


def test_weighted_split_uses_integer_floor_division(spark):
    # a -> b (w=1), a -> c (w=2): contributions split 1/3 vs 2/3 with
    # FLOOR division — the exact values the SQL oracle reproduces
    df = domain_pagerank(
        _edges(spark, [("a", "b", 1), ("a", "c", 2)]), iterations=1
    )
    got = {r.node: r.pr_scaled for r in df.collect()}
    assert got["b"] == 150_000_000 + (85 * 10**9 * 1) // 300
    assert got["c"] == 150_000_000 + (85 * 10**9 * 2) // 300


def test_empty_edges_empty_result(spark):
    df = domain_pagerank(_edges(spark, []))
    assert df.count() == 0
    assert df.columns == ["node", "pr_scaled"]


def test_deterministic_across_runs(spark):
    rows = [("a", "b", 5), ("b", "c", 2), ("c", "a", 7), ("a", "c", 1)]
    a = sorted(map(tuple, domain_pagerank(_edges(spark, rows)).collect()))
    b = sorted(map(tuple, domain_pagerank(_edges(spark, rows)).collect()))
    assert a == b


def test_reach_hop_distances(spark):
    from cdk_datalake_ingest_upeu_spark.operators.graph import domain_reach

    df = domain_reach(
        _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("x", "a", 1)]),
        ["a"],
    )
    got = {r.node: r.hops for r in df.collect()}
    # x only points INTO a — not reachable FROM a
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_reach_multi_source_takes_min(spark):
    from cdk_datalake_ingest_upeu_spark.operators.graph import domain_reach

    df = domain_reach(
        _edges(spark, [("a", "b", 1), ("b", "c", 1)]), ["a", "c"]
    )
    got = {r.node: r.hops for r in df.collect()}
    assert got == {"a": 0, "c": 0, "b": 1}


def test_reach_max_hops_truncates(spark):
    from cdk_datalake_ingest_upeu_spark.operators.graph import domain_reach

    df = domain_reach(
        _edges(spark, [("a", "b", 1), ("b", "c", 1)]), ["a"], max_hops=1
    )
    got = {r.node: r.hops for r in df.collect()}
    assert got == {"a": 0, "b": 1}


def test_id_grain_table_rejected_before_collect(spark):
    """An edge table past max_edges raises the named gate error instead
    of silently collecting a corpus-sized relation to the driver."""
    from cdk_datalake_ingest_upeu_spark.operators.graph import (
        EdgeTableTooLargeError,
    )

    pairs = spark.range(0, 500).selectExpr(
        "CAST(id AS STRING) AS src",
        "CAST(id + 1 AS STRING) AS dst",
        "CAST(1 AS LONG) AS w",
    )
    with pytest.raises(EdgeTableTooLargeError, match="domain grain"):
        domain_pagerank(pairs, max_edges=100)
    with pytest.raises(EdgeTableTooLargeError, match="domain grain"):
        domain_reach(pairs, ["0"], max_edges=100)
    # at-or-under the gate still runs
    small = pairs.limit(3)
    assert domain_pagerank(small, max_edges=100).count() > 0


def test_zero_outweight_source_is_dangling_not_crash(spark):
    """All-zero aggregated weights for a source must not divide by zero:
    the source pushes no mass (dangling), everything else proceeds."""
    edges = spark.createDataFrame(
        [("a", "b", 0), ("b", "c", 5)], "src string, dst string, w long"
    )
    got = {r["node"]: r["pr_scaled"] for r in domain_pagerank(edges).collect()}
    assert set(got) == {"a", "b", "c"}
    assert got["a"] == 150_000_000  # teleport only: nothing ranks into a
    assert got["c"] > got["a"]  # b's full mass flows to c


def test_negative_weight_rejected(spark):
    edges = spark.createDataFrame(
        [("a", "b", -1)], "src string, dst string, w long"
    )
    with pytest.raises(ValueError, match="negative"):
        domain_pagerank(edges)

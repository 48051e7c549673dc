"""Catalog integrity guards: every declared query must be runnable by
the driver and oracle-checkable; a QUERIES/ORACLES drift (renamed query,
forgotten oracle entry) otherwise surfaces only as a driver-window slot
burned on an error row (the r4 `no_oracle` lesson)."""

from cdk_datalake_ingest_upeu_spark.workloads import ORACLES, QUERIES


def test_every_query_has_an_oracle():
    missing = sorted(set(QUERIES) - set(ORACLES))
    assert not missing, f"queries without ORACLES entries: {missing}"


def test_no_orphan_oracles():
    orphans = sorted(set(ORACLES) - set(QUERIES))
    assert not orphans, f"ORACLES entries without queries: {orphans}"


def test_all_queries_callable_and_window_full():
    assert all(callable(fn) for fn in QUERIES.values())
    # the driver's correctness gate checks the FIRST 50 entries
    assert len(QUERIES) >= 50

"""SCD2 history builder + incremental upsert (operators/scd.py)."""

import datetime as dt

from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.scd import scd2_history, scd2_upsert


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _changelog(spark):
    rows = [
        # key 1: A, A (dup run), B, A again — 3 versions
        (1, _ts(1), "A"),
        (1, _ts(2), "A"),
        (1, _ts(3), "B"),
        (1, _ts(4), "A"),
        # key 2: single observation — 1 current version
        (2, _ts(1), "X"),
        # key 3: NULL -> value -> NULL — null-safe change detection
        (3, _ts(1), None),
        (3, _ts(2), "Y"),
        (3, _ts(3), None),
    ]
    return spark.createDataFrame(rows, "k int, ts timestamp, attr string")


def test_scd2_history_runs_and_intervals(spark):
    hist = scd2_history(_changelog(spark), "k", "attr", "ts").orderBy(
        "k", "valid_from"
    )
    got = [
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in hist.collect()
    ]
    assert got == [
        (1, "A", _ts(1), _ts(3), False),
        (1, "B", _ts(3), _ts(4), False),
        (1, "A", _ts(4), None, True),
        (2, "X", _ts(1), None, True),
        (3, None, _ts(1), _ts(2), False),
        (3, "Y", _ts(2), _ts(3), False),
        (3, None, _ts(3), None, True),
    ]


def test_scd2_history_single_exchange(spark):
    plan = scd2_history(
        _changelog(spark), "k", "attr", "ts"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_scd2_upsert_close_append_passthrough(spark):
    dim = scd2_history(_changelog(spark), "k", "attr", "ts")
    batch = spark.createDataFrame(
        [
            (1, "C", _ts(5)),  # changed -> close current, open C
            (2, "X", _ts(5)),  # unchanged -> no-op
            (9, "N", _ts(5)),  # brand-new key -> open N
        ],
        "k int, attr string, bts timestamp",
    )
    merged = scd2_upsert(dim, batch, "k", "attr", "bts")
    got = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in merged.collect()
    }
    # history untouched
    assert (1, "A", _ts(1), _ts(3), False) in got
    # key 1 current closed at batch ts, new C version open
    assert (1, "A", _ts(4), _ts(5), False) in got
    assert (1, "C", _ts(5), None, True) in got
    # key 2 unchanged
    assert (2, "X", _ts(1), None, True) in got
    # new key opened
    assert (9, "N", _ts(5), None, True) in got
    # exactly one current row per key
    cur = merged.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)
    assert merged.count() == len(got)


def test_scd2_upsert_roundtrip_matches_rebuild(spark):
    """Merging the day-5 snapshot into the day-<=4 history equals
    rebuilding from the full changelog (for keys whose snapshot state
    is their day-5 observation)."""
    log = _changelog(spark)
    early = log.filter(F.col("ts") < _ts(4))
    dim = scd2_history(early, "k", "attr", "ts")
    batch = (
        log.filter(F.col("ts") >= _ts(4))
        .select("k", "attr", F.col("ts").alias("bts"))
    )
    merged = scd2_upsert(dim, batch, "k", "attr", "bts")
    full = scd2_history(log, "k", "attr", "ts")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_point_in_time_join_picks_containing_version(spark):
    """Each fact lands in the version whose interval contains it; facts
    before the first version keep NULLs; current (open) versions match
    everything at or after their start; boundaries: valid_from
    inclusive, valid_to exclusive."""
    from pyspark.sql import functions as F  # noqa: F401

    from cdk_datalake_ingest_upeu_spark.operators.scd import (
        scd2_point_in_time_join,
    )

    hist = spark.createDataFrame(
        [
            (1, "bronze", 10, 20),
            (1, "silver", 20, 40),
            (1, "gold", 40, None),
            (2, "trial", 100, None),
        ],
        "user_id long, tier string, valid_from long, valid_to long",
    )
    facts = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 10), (3, 1, 20), (4, 1, 39), (5, 1, 40),
         (6, 1, 999), (7, 2, 99), (8, 2, 100)],
        "fact_id long, user_id long, ts long",
    )
    got = {
        r.fact_id: r.tier
        for r in scd2_point_in_time_join(facts, hist, "user_id", "ts").collect()
    }
    assert got == {
        1: None,        # before first version
        2: "bronze",    # valid_from inclusive
        3: "silver",    # valid_to exclusive / next valid_from inclusive
        4: "silver",
        5: "gold",
        6: "gold",      # open current version
        7: None,
        8: "trial",
    }

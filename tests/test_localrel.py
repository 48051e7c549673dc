"""rows_df must be EXACTLY createDataFrame(list, schema): same schema,
same values — including the hazards the Arrow path could plausibly get
wrong (numeric NULL vs NaN, naive timestamps under the UTC session,
arrays with NULL elements, empty row lists). A drift here would flip
oracle hashes on every wrapper that assembles literal result rows."""

from datetime import date, datetime

import pytest

from cdk_datalake_ingest_upeu_spark.functions.localrel import rows_df

CASES = [
    ([(-1, 5, 0.0)], "a long, b long, c double"),
    # NULL stays NULL, NaN stays NaN (the pandas route would merge them)
    ([(None, float("nan"), 1.5), (2, None, None)], "a long, b double, c double"),
    ([("x", None), (None, "y")], "a string, b string"),
    ([(datetime(2024, 5, 1, 12, 30), date(2024, 5, 1))], "ts timestamp, d date"),
    ([(1, [1.0, 2.0, None]), (2, None)], "id long, v array<double>"),
    ([(True, False, None)], "a boolean, b boolean, c boolean"),
    ([(1, 2)], "a int, b smallint"),
    ([], "a long, b string"),
]


@pytest.mark.parametrize("rows,schema", CASES, ids=[c[1] for c in CASES])
def test_rows_df_matches_classic_createDataFrame(spark, rows, schema):
    new = rows_df(spark, rows, schema)
    old = spark.createDataFrame(rows, schema)
    assert new.schema == old.schema
    assert repr(sorted(new.collect(), key=repr)) == repr(
        sorted(old.collect(), key=repr)
    )


def test_rows_df_is_not_python_rdd_backed(spark):
    """The whole point: the frame must be a JVM local relation, not a
    parallelized Python RDD that re-pays a Python worker per job."""
    df = rows_df(spark, [(-1, 0.0)], "a long, b double")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan, plan


def test_overlap_runs_all_and_propagates_errors():
    from cdk_datalake_ingest_upeu_spark.streaming.incremental import _overlap

    hits = []
    _overlap(lambda: hits.append("a"), lambda: hits.append("b"))
    assert sorted(hits) == ["a", "b"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="boom"):
        _overlap(
            lambda: None,
            lambda: (_ for _ in ()).throw(ValueError("boom")),
        )


def test_rows_df_review_hazards(spark):
    """Review-pinned fallback paths: dict rows and one-shot iterables
    must match the classic path exactly (not silently corrupt/empty)."""
    out = rows_df(spark, [{"a": "x", "b": "y"}], "a string, b string")
    assert [tuple(r) for r in out.collect()] == [("x", "y")]

    gen = ((i, float(i)) for i in range(3))
    out = rows_df(spark, gen, "a long, b double")
    assert out.count() == 3


def test_banding_sweep_empty_and_single_config(spark):
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        minhash_banding_sweep,
        minhash_signature_table,
    )

    docs = spark.createDataFrame(
        [(i, "w%d common text tail here" % (i % 3)) for i in range(12)],
        "doc_id string, text string",
    )
    sigs = minhash_signature_table(docs)
    assert minhash_banding_sweep(sigs, bands_list=()) == []
    one = minhash_banding_sweep(sigs, bands_list=(4,))
    assert len(one) == 1 and one[0]["superset_of_coarser"] is True

"""Engine-boundary canonicalization: the Spark and DuckDB halves of each
canon rule must agree CELL FOR CELL on hostile values — NaN, ±Inf,
sci-notation zones, half-ulp-hostile full precision, past-mantissa
magnitudes, NULL. These are the rules every oracle-gated query rides on
(functions/stable.py, operators/profile canon rules), so the parity is
pinned here rather than asserted in docstrings.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.functions.stable import fp_canon, fp_sql

HOSTILE = [
    0.0,
    1.0,
    -1.0,
    0.05,
    123.456,
    1e-4,          # Java sci-notation zone
    -1e-4,
    1.23456789e7,  # Java sci-notation zone (>= 1e7)
    1.0 / 3.0,     # full precision
    123.455,       # .5-cent boundary shape
    -123.455,
    1e13,          # near the sum clamp
    1e15,          # past the sum clamp -> saturates
    -1e15,
    1e300,         # saturates (and would overflow any integer)
    float("inf"),
    float("-inf"),
    float("nan"),  # -> NULL on both engines
    None,
]


@pytest.mark.parametrize("scale", [100, 1000000])
def test_fp_canon_matches_fp_sql_cell_for_cell(spark, scale):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(HOSTILE)],
                               "i int, x double")
    got_spark = {
        r.i: r.c
        for r in df.select("i", fp_canon(F.col("x"), scale).alias("c")).collect()
    }
    # the SAME emitted SQL must run on Spark too (portability contract)
    got_spark_sql = {
        r.i: r.c
        for r in df.selectExpr("i", f"{fp_sql('x', scale)} AS c").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, v) for i, v in enumerate(HOSTILE)])
    got_duck = dict(
        con.sql(f"SELECT i, {fp_sql('x', scale)} AS c FROM t").fetchall()
    )
    assert got_spark == got_duck
    assert got_spark_sql == got_duck
    # NaN -> NULL, saturation pinned (NaN != NaN, so locate by isnan)
    nan_i = next(
        i for i, v in enumerate(HOSTILE)
        if isinstance(v, float) and v != v
    )
    assert got_spark[nan_i] is None
    big_i = HOSTILE.index(1e300)
    assert got_spark[big_i] == 100000000000000


def test_profile_canon_text_matches_oracle_expr(spark):
    """operators/profile: the per-type canon text used by
    dataset_checksum must agree with its generated DuckDB twin."""
    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        _canon_text,
        canon_oracle_expr,
    )

    rows = [(i, v) for i, v in enumerate(HOSTILE)]
    df = spark.createDataFrame(rows, "i int, x double")
    got_spark = {
        r.i: r.c for r in df.select("i", _canon_text(df, "x").alias("c")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got_duck = dict(
        con.sql(
            f"SELECT i, {canon_oracle_expr('x', 'numeric')} AS c FROM t"
        ).fetchall()
    )
    assert got_spark == got_duck
    nan_i = next(
        i for i, v in enumerate(HOSTILE)
        if isinstance(v, float) and v != v
    )
    assert got_spark[nan_i] == "nan"
    assert got_spark[HOSTILE.index(None)] is None

    # int columns route through the same double path: an int64 drop and
    # a re-typed double drop hash identically
    di = spark.createDataFrame([(1, 42), (2, 7)], "i int, x long")
    got_int = {
        r.i: r.c for r in di.select("i", _canon_text(di, "x").alias("c")).collect()
    }
    dd = spark.createDataFrame([(1, 42.0), (2, 7.0)], "i int, x double")
    got_dbl = {
        r.i: r.c for r in dd.select("i", _canon_text(dd, "x").alias("c")).collect()
    }
    assert got_int == got_dbl


def test_asof_join_null_payload_field_not_torn(spark):
    """A right row whose PAYLOAD field is NULL must deliver that NULL —
    not a backfilled value from an older right row (the torn-row bug the
    hostile-NULLs sweep caught: independent per-column
    last(ignorenulls) carries)."""
    from cdk_datalake_ingest_upeu_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 100, "a"), (1, 300, "b")],
                                 "k int, t long, tag string")
    right = spark.createDataFrame(
        [(1, 50, 10, 5.0), (1, 200, 20, None)],
        "k int, rt long, rid int, rv double",
    )
    out = {
        r.tag: (r.rid, r.rv)
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt"
        ).collect()
    }
    assert out["a"] == (10, 5.0)
    # latest match is rid=20 with a GENUINE NULL rv — must stay NULL
    assert out["b"] == (20, None)


def test_forget_boilerplate_index_retract_equals_rebuild(spark):
    """Negative-delta index maintenance == from-scratch rebuild on the
    kept corpus (exact because a doc lives in exactly one batch)."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        boilerplate_index,
        forget_boilerplate_index,
    )

    txt = "one two three four five six seven eight nine ten " * 6
    rows = [(i, ("HDR common " + txt) if i % 2 else txt, "s1") for i in range(20)]
    rows += [(100 + i, txt + f" uniq{i} " + txt, "s2") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    freq, gdocs = boilerplate_index(docs)
    forgotten = docs.filter(F.col("doc_id").isin(1, 3, 100))
    f2, g2 = forget_boilerplate_index(freq, gdocs, forgotten)
    kept = docs.join(forgotten.select("doc_id"), "doc_id", "left_anti")
    rf, rg = boilerplate_index(kept)
    assert f2.exceptAll(rf).count() == 0 and rf.exceptAll(f2).count() == 0
    assert g2.exceptAll(rg).count() == 0 and rg.exceptAll(g2).count() == 0

"""Operator-level tests for the fn_transform_* library.

Boundary cases follow SURVEY.md §7.4: magic-date offset boundaries, the
>100000 magic sniff, rule-priority reversal in Case, '&' compound rules,
and default-value conventions.
"""

import datetime as dt
import os

import pytest

from pyspark.sql import types as T

from cdk_datalake_ingest_upeu_spark.config.models import ColumnSpec
from cdk_datalake_ingest_upeu_spark.functions.engine import (
    TransformationEngine,
    TransformSeverityError,
)

E = TransformationEngine()


def run_one(spark, data, schema, transformation, data_type="string", name="out"):
    df = spark.createDataFrame(data, schema)
    cols = [ColumnSpec(name, 1, data_type, transformation)]
    return [r[name] for r in E.apply(df, cols).df.collect()]


def test_integer_cast_junk_to_null(spark):
    out = run_one(spark, [("12",), ("junk",), (None,)], "x string", "fn_transform_Integer(x)", "int")
    assert out == [12, None, None]


def test_clearstring_default_and_null(spark):
    data = [("  hi  ",), ("None",), ("NULL",), ("null",), ("",), ("   ",), (None,), ("ok",)]
    out = run_one(spark, data, "x string", "fn_transform_ClearString(x,$DEF)")
    assert out == ["hi", "DEF", "DEF", "DEF", "DEF", "DEF", "DEF", "ok"]
    out2 = run_one(spark, data, "x string", "fn_transform_ClearString(x)")
    assert out2 == ["hi", None, None, None, None, None, None, "ok"]


def test_clearstring_column_default(spark):
    df_data = [("", "fallback")]
    out = run_one(
        spark, df_data, "x string, y string", "fn_transform_ClearString(x,y)"
    )
    assert out == ["fallback"]


def test_datemagic_magic_boundaries(spark):
    data = [("693596",), ("693597",), ("739062",), ("100000",), ("100001",), (None,)]
    out = run_one(spark, data, "x string", "fn_transform_DateMagic(x,yyyy-MM-dd)", "date")
    assert out[0] == dt.date(1900, 1, 1)
    assert out[1] == dt.date(1900, 1, 2)
    assert out[2] == dt.date(2024, 6, 25)
    # 100000 is NOT magic (sniff is strictly > 100000) and isn't a date string
    assert out[3] is None
    # 100001 IS magic: 1900-01-01 + (100001-693596) days -> pre-1900
    assert out[4] == dt.date(1900, 1, 1) + dt.timedelta(days=100001 - 693596)
    assert out[5] is None


def test_datemagic_string_parse_and_default(spark):
    data = [("2024-06-25",), ("bad",), (None,)]
    out = run_one(
        spark, data, "x string", "fn_transform_DateMagic(x,yyyy-MM-dd,1999-12-31)", "date"
    )
    assert out == [dt.date(2024, 6, 25), dt.date(1999, 12, 31), dt.date(1999, 12, 31)]


def test_datemagic_unknown_format_falls_back(spark):
    out = run_one(
        spark, [("2024-06-25",)], "x string", "fn_transform_DateMagic(x,weird-fmt)", "date"
    )
    assert out == [dt.date(2024, 6, 25)]


def test_datetimemagic_time_padding(spark):
    data = [(739062, "070000"), (739062, "70000"), (739062, "0"), (None, "070000")]
    out = run_one(
        spark,
        data,
        "d int, t string",
        "fn_transform_DatetimeMagic(d,t,yyyy-MM-dd HH:mm:ss)",
        "timestamp",
    )
    assert out[0] == dt.datetime(2024, 6, 25, 7, 0, 0)
    # 5-digit int time lpads to 070000
    assert out[1] == dt.datetime(2024, 6, 25, 7, 0, 0)
    assert out[2] == dt.datetime(2024, 6, 25, 0, 0, 0)
    assert out[3] is None


def test_datetimemagic_default(spark):
    out = run_one(
        spark,
        [(None, None)],
        "d int, t string",
        "fn_transform_DatetimeMagic(d,t,yyyy-MM-dd HH:mm:ss,1900-01-01 00:00:01)",
        "timestamp",
    )
    assert out == [dt.datetime(1900, 1, 1, 0, 0, 1)]


def test_periodmagic(spark):
    data = [(3, 2025), (None, 2025), (12, None), (11, 2024)]
    out = run_one(spark, data, "m int, y int", "fn_transform_PeriodMagic(m,y)")
    assert out == ["202503", "190001", "190001", "202411"]


def test_bytemagic_variants(spark):
    data = [("T",), ("F",), ("0x54",), ("0x46",), ("junk",), (None,)]
    out = run_one(spark, data, "x string", "fn_transform_ByteMagic(x,$F)")
    assert out == ["T", "F", "T", "F", "F", "F"]


def test_bytemagic_int_codes(spark):
    out = run_one(spark, [(84,), (70,), (1,), (None,)], "x int", "fn_transform_ByteMagic(x)")
    assert out == ["T", "F", "F", "F"]


def test_case_keeps_unmatched_and_later_rule_wins(spark):
    data = [("001",), ("002",), ("003",), ("999",)]
    out = run_one(
        spark, data, "x string", "fn_transform_Case(x,001|002->Activo,003->Inactivo)"
    )
    assert out == ["Activo", "Activo", "Inactivo", "999"]
    # later rules override earlier ones for overlapping values (reference quirk)
    out2 = run_one(spark, [("001",)], "x string", "fn_transform_Case(x,001->A,001->B)")
    assert out2 == ["B"]


def test_case_with_default_simple(spark):
    out = run_one(
        spark,
        [("O",), ("F",), ("X",)],
        "x string",
        "fn_transform_Case_with_default(x,O|F->Done,$Other)",
    )
    assert out == ["Done", "Done", "Other"]


def test_case_with_default_compound(spark):
    data = [("03", "003"), ("03", "004"), ("04", "003"), ("05", "009")]
    out = run_one(
        spark,
        data,
        "linea string, familia string",
        "fn_transform_Case_with_default(linea&familia,03&003|04&003->T,$F)",
    )
    assert out == ["T", "F", "T", "F"]


def test_concatenate_null_to_blank(spark):
    data = [("a", "b"), (None, "b"), (" a ", None)]
    out = run_one(spark, data, "x string, y string", "fn_transform_Concatenate(x,y)")
    assert out == ["a|b", "|b", "a|"]


def test_concatenate_ws_custom_sep(spark):
    out = run_one(
        spark, [("a", "b")], "x string, y string", "fn_transform_Concatenate_ws(x,y,-)"
    )
    assert out == ["a-b"]


def test_numeric_uses_declared_decimal(spark):
    from decimal import Decimal

    out = run_one(
        spark, [("12.345",)], "x string", "fn_transform_Numeric(x)", "numeric(10,2)"
    )
    assert out == [Decimal("12.35")]


def test_datetime_no_args_is_now(spark):
    out = run_one(spark, [(1,)], "x int", "fn_transform_Datetime()", "timestamp")
    assert isinstance(out[0], dt.datetime)


def test_nested_date_to_string(spark):
    out = run_one(
        spark,
        [(739062,)],
        "x int",
        "fn_transform_Date_to_String(fn_transform_DateMagic(x,yyyy-MM-dd),yyyyMM)",
    )
    assert out == ["202406"]


def test_engine_error_thresholds(spark):
    df = spark.createDataFrame([(1, "a")], "id int, x string")
    # 1 of 3 columns broken (33%) -> warning, column becomes typed NULL
    cols = [
        ColumnSpec("id", 1, "int", "id"),
        ColumnSpec("x", 2, "string", "x"),
        ColumnSpec("bad", 3, "int", "fn_transform_Nope(x)"),
    ]
    res = E.apply(df, cols)
    assert len(res.errors) == 1 and res.warnings
    row = res.df.collect()[0]
    assert row["bad"] is None

    # 2 of 3 broken (67%) -> severity error
    cols_bad = [
        ColumnSpec("a", 1, "int", "fn_transform_Nope(x)"),
        ColumnSpec("b", 2, "int", "fn_transform_Nada(x)"),
        ColumnSpec("c", 3, "string", "x"),
    ]
    with pytest.raises(TransformSeverityError):
        E.apply(df, cols_bad)


def test_blank_transformation_is_typed_null(spark):
    df = spark.createDataFrame([(1,)], "id int")
    res = E.apply(df, [ColumnSpec("id", 1, "int", "id"), ColumnSpec("empty", 2, "double", "")])
    assert res.df.schema["empty"].dataType.typeName() == "double"
    assert res.df.collect()[0]["empty"] is None


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/artifacts/configuration/csv"),
    reason="reference csvs absent",
)
def test_every_shipped_transform_expression_compiles(spark):
    """Parity sweep: every TRANSFORMATION expression in the reference's
    actual columns.csv must parse and compile to a Catalyst expression
    with zero engine errors (source columns stubbed as strings, the
    reference's all-string raw zone)."""
    from cdk_datalake_ingest_upeu_spark.config import (
        columns_for_table,
        load_config_csv,
    )

    ref = "/root/reference/artifacts/configuration/csv"
    tables = load_config_csv(os.path.join(ref, "tables.csv"))
    columns = load_config_csv(os.path.join(ref, "columns.csv"))
    table_names = sorted(
        {r["TABLE_NAME"] for r in columns if r.get("TABLE_NAME")}
    )
    assert len(table_names) >= 30

    engine = TransformationEngine()
    total_cols = 0
    for name in table_names:
        cols = columns_for_table(columns, name)
        if not cols:
            continue
        src_names = [c.name for c in cols]
        schema = T.StructType([T.StructField(n, T.StringType()) for n in src_names])
        df = spark.createDataFrame([tuple("1" for _ in src_names)], schema)
        res = engine.apply(df, cols)
        assert res.errors == [], f"{name}: {res.errors}"
        # the compiled plan must actually execute too
        assert res.df.count() == 1
        total_cols += len(cols)
    assert total_cols >= 600  # the shipped config carries ~690 expressions

"""The ``fn_transform_*`` scalar function library.

Each function builds a pure ``pyspark.sql.Column`` expression (no Python
UDFs — everything stays inside Catalyst/whole-stage codegen, which is
what lets these run unchanged over 100 TB). Semantics re-implement the
reference's transform library (``light_transform.py:823-1326``) exactly,
including its null/default quirks; each docstring cites the reference
lines the behaviour is checked against.

Functions receive *resolved* parameters: nested calls and dataframe
column references arrive as ``Column``; everything else arrives as the
raw string token (literal, format, rule, ``$``-prefixed default...).

Extension point: :func:`register_function` accepts any callable with the
``(params, data_type) -> Column`` signature — including ones built on
``pandas_udf`` for logic Catalyst can't express.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdk_datalake_ingest_upeu_spark.functions.dates import MAGIC_OFFSET

FUNCTION_REGISTRY: dict[str, Callable[[list, str], Column]] = {}

# Return types used when a call is nested inside another call
# (reference ``light_transform.py:797-820``).
FUNCTION_RETURN_TYPES = {
    "fn_transform_Date": "date",
    "fn_transform_DateMagic": "date",
    "fn_transform_DatetimeMagic": "timestamp",
    "fn_transform_Datetime": "timestamp",
    "fn_transform_Integer": "integer",
    "fn_transform_Double": "double",
    "fn_transform_Numeric": "double",
    "fn_transform_Boolean": "boolean",
}

_DATE_FORMATS = {"yyyy-MM-dd", "yyyyMMdd", "dd/MM/yyyy", "MM/dd/yyyy"}


class UnknownFunctionError(ValueError):
    pass


def register_function(name: str, fn: Callable[[list, str], Column], return_type: str = "string") -> None:
    FUNCTION_REGISTRY[name] = fn
    FUNCTION_RETURN_TYPES.setdefault(name, return_type)


def apply_function(name: str, params: list, data_type: str) -> Column:
    try:
        fn = FUNCTION_REGISTRY[name]
    except KeyError:
        raise UnknownFunctionError(f"unsupported transform function: {name}") from None
    return fn(params, data_type)


def spark_type_for(data_type: str) -> T.DataType:
    """Config type string -> Spark type (reference ``light_transform.py:1328-1344``)."""
    dt = (data_type or "string").lower()
    if "numeric" in dt:
        return parse_decimal_type(dt)
    return {
        "string": T.StringType(),
        "int": T.IntegerType(),
        "integer": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.DoubleType(),
        "boolean": T.BooleanType(),
        "timestamp": T.TimestampType(),
        "date": T.DateType(),
    }.get(dt, T.StringType())


def parse_decimal_type(data_type: str) -> T.DecimalType:
    """``numeric(p,s)`` -> DecimalType (default 18,2 — ``light_transform.py:1346-1354``)."""
    m = re.search(r"numeric\((\d+),(\d+)\)", (data_type or "").lower())
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    return T.DecimalType(18, 2)


# ---------------------------------------------------------------------------
# parameter coercion helpers
# ---------------------------------------------------------------------------

def _as_column(p) -> Column:
    """A resolved param that should act as a column expression."""
    return p if isinstance(p, Column) else F.col(p)


def _default_expr(token, *, null_type: T.DataType | None = None) -> Column:
    """``$literal`` -> lit, column name -> col (reference ClearString/ByteMagic
    default convention, ``light_transform.py:851-858,1195-1200``)."""
    if isinstance(token, Column):
        return token
    if isinstance(token, str) and token.startswith("$"):
        return F.lit(token[1:])
    if isinstance(token, str):
        return F.col(token)
    return F.lit(None).cast(null_type or T.StringType())


def _clean_str(p) -> Column:
    """Trimmed string form with NULL/blank collapsed to '' (Concatenate's
    per-part normalization, ``light_transform.py:836-842``)."""
    c = _as_column(p) if isinstance(p, Column) else None
    if c is None:
        return F.lit(str(p))
    return F.coalesce(F.trim(c.cast(T.StringType())), F.lit(""))


def _magic_date(origin: Column) -> Column:
    """days-since-1900 serial -> date (offset 693596; ``light_transform.py:904-907``)."""
    return F.date_add(
        F.to_date(F.lit("1900-01-01")),
        origin.cast(T.IntegerType()) - F.lit(MAGIC_OFFSET),
    )


def _is_magic(origin: Column) -> Column:
    """The reference's magic-number sniff: int-castable and > 100000
    (``light_transform.py:922-926``)."""
    as_int = origin.cast(T.IntegerType())
    return as_int.isNotNull() & (as_int > F.lit(100000))


def _mapped_format(token) -> str:
    fmt = token if isinstance(token, str) else "yyyy-MM-dd"
    return fmt if fmt in _DATE_FORMATS else "yyyy-MM-dd"


# ---------------------------------------------------------------------------
# the library
# ---------------------------------------------------------------------------

def fn_concatenate(params: list, data_type: str) -> Column:
    """Pipe-joined concat; NULL/blank parts become '' (``light_transform.py:828-842``)."""
    return F.concat_ws("|", *[_clean_str(p) for p in params])


def fn_concatenate_ws(params: list, data_type: str) -> Column:
    """Concat with caller-chosen separator as the LAST param
    (``light_transform.py:937-951``)."""
    if len(params) < 2:
        raise ValueError("fn_transform_Concatenate_ws requires >= 2 params")
    separator = params[-1] if isinstance(params[-1], str) else "|"
    return F.concat_ws(separator, *[_clean_str(p) for p in params[:-1]])


def fn_clear_string(params: list, data_type: str) -> Column:
    """Trim; NULL/''/'None'/'NULL'/'null' -> default (or NULL)
    (``light_transform.py:844-873``)."""
    if not params:
        raise ValueError("fn_transform_ClearString requires a column")
    origin = _as_column(params[0])
    is_blank = (
        origin.isNull()
        | (F.trim(origin) == "")
        | F.trim(origin).isin("None", "NULL", "null")
    )
    if len(params) > 1:
        return F.when(is_blank, _default_expr(params[1])).otherwise(F.trim(origin))
    return F.when(is_blank, F.lit(None).cast(T.StringType())).otherwise(F.trim(origin))


def fn_date_magic(params: list, data_type: str) -> Column:
    """Magic serial (>100000) or formatted string -> date, with default
    (``light_transform.py:875-935``)."""
    if len(params) < 2:
        raise ValueError("fn_transform_DateMagic requires >= 2 params")
    origin = _as_column(params[0])
    fmt = _mapped_format(params[1])
    default = params[2] if len(params) > 2 else "to_null"

    if isinstance(default, str) and default.lower() == "to_null":
        default_date = F.lit(None).cast(T.DateType())
    else:
        default_date = F.to_date(F.lit(default) if isinstance(default, str) else default, "yyyy-MM-dd")

    return (
        F.when(origin.isNull(), default_date)
        .when(_is_magic(origin), _magic_date(origin))
        .otherwise(F.coalesce(F.to_date(origin.cast(T.StringType()), fmt), default_date))
    )


def fn_date(params: list, data_type: str) -> Column:
    """Formatted string -> date with default; no magic sniff
    (``light_transform.py:1102-1149``)."""
    if len(params) < 2:
        raise ValueError("fn_transform_Date requires >= 2 params")
    origin = _as_column(params[0])
    fmt = _mapped_format(params[1])
    default = params[2] if len(params) > 2 else "to_null"
    if isinstance(default, str) and default.lower() == "to_null":
        default_date = F.lit(None).cast(T.DateType())
    elif isinstance(default, str):
        default_date = F.to_date(F.lit(default), "yyyy-MM-dd")
    else:
        default_date = default
    return F.when(origin.isNull(), default_date).otherwise(
        F.coalesce(F.to_date(origin.cast(T.StringType()), fmt), default_date)
    )


def fn_datetime(params: list, data_type: str) -> Column:
    """to_timestamp; no params -> current_timestamp (``light_transform.py:974-978``)."""
    if not params:
        return F.current_timestamp()
    origin = _as_column(params[0])
    return F.coalesce(F.to_timestamp(origin), F.lit(None).cast(T.TimestampType()))


def fn_datetime_magic(params: list, data_type: str) -> Column:
    """Magic day serial + HHMMSS int/str time -> timestamp
    (``light_transform.py:980-1080``)."""
    if len(params) < 3:
        raise ValueError("fn_transform_DatetimeMagic requires >= 3 params")
    date_p = _as_column(params[0])
    time_p = _as_column(params[1])
    default = params[3] if len(params) > 3 else "to_null"

    converted_date = (
        F.when(date_p.isNull(), F.lit(None).cast(T.DateType()))
        .when(_is_magic(date_p), _magic_date(date_p))
        .otherwise(F.to_date(date_p.cast(T.StringType()), "yyyy-MM-dd"))
    )
    hhmmss = F.lpad(time_p.cast(T.StringType()), 6, "0")
    time_str = F.concat_ws(
        ":",
        F.substring(hhmmss, 1, 2),
        F.substring(hhmmss, 3, 2),
        F.substring(hhmmss, 5, 2),
    )
    stamp = F.to_timestamp(
        F.concat(converted_date.cast(T.StringType()), F.lit(" "), time_str),
        "yyyy-MM-dd HH:mm:ss",
    )
    if isinstance(default, str) and default.lower() == "to_null":
        return F.coalesce(stamp, F.lit(None).cast(T.TimestampType()))
    return F.coalesce(stamp, F.to_timestamp(F.lit(default), "yyyy-MM-dd HH:mm:ss"))


def fn_date_to_string(params: list, data_type: str) -> Column:
    """date_format over a date expression or literal
    (``light_transform.py:1082-1100``)."""
    if len(params) < 2:
        raise ValueError("fn_transform_Date_to_String requires 2 params")
    date_p = params[0]
    fmt = params[1] if isinstance(params[1], str) else "yyyyMM"
    if isinstance(date_p, str):
        date_p = F.to_date(F.lit(date_p))
    return F.date_format(date_p, fmt)


def _cast_fn(spark_type: T.DataType) -> Callable[[list, str], Column]:
    def _fn(params: list, data_type: str) -> Column:
        if not params:
            raise ValueError("cast transform requires a column")
        origin = _as_column(params[0])
        return F.coalesce(origin.cast(spark_type), F.lit(None).cast(spark_type))

    return _fn


def fn_numeric(params: list, data_type: str) -> Column:
    """Cast to the DecimalType declared in NEW_DATA_TYPE
    (``light_transform.py:967-972,1346-1354``)."""
    if not params:
        raise ValueError("fn_transform_Numeric requires a column")
    origin = _as_column(params[0])
    target = parse_decimal_type(data_type)
    return F.coalesce(origin.cast(target), F.lit(None).cast(target))


def fn_period_magic(params: list, data_type: str) -> Column:
    """(month, year) -> 'YYYYMM'; NULLs -> '190001'
    (``light_transform.py:1151-1178``)."""
    if len(params) < 2:
        raise ValueError("fn_transform_PeriodMagic requires 2 params")
    period = _as_column(params[0])
    year = _as_column(params[1])
    return F.when(period.isNull() | year.isNull(), F.lit("190001")).otherwise(
        F.concat(year.cast(T.StringType()), F.lpad(period.cast(T.StringType()), 2, "0"))
    )


def fn_byte_magic(params: list, data_type: str) -> Column:
    """byte/hex/int flag -> 'T'/'F' with default (``light_transform.py:1180-1213``)."""
    if not params:
        raise ValueError("fn_transform_ByteMagic requires a column")
    origin = _as_column(params[0])
    default = _default_expr(params[1] if len(params) > 1 else "$F")
    return (
        F.when(origin.isNull(), default)
        .when(origin == F.lit("T"), F.lit("T"))
        .when(origin == F.lit("F"), F.lit("F"))
        .when(origin.cast(T.StringType()) == "0x54", F.lit("T"))
        .when(origin.cast(T.StringType()) == "0x46", F.lit("F"))
        .when(origin == F.lit(84), F.lit("T"))
        .when(origin == F.lit(70), F.lit("F"))
        .otherwise(default)
    )


def _apply_rules(base: Column, origin: Column, rules: list[str]) -> Column:
    """Layer ``v1|v2->label`` rules; later rules wrap (and therefore WIN over)
    earlier ones — reference quirk preserved (``light_transform.py:1236-1243``)."""
    out = base
    for rule in rules:
        if isinstance(rule, str) and "->" in rule:
            values, label = rule.split("->", 1)
            wanted = [v.strip() for v in values.split("|")]
            out = F.when(origin.isin(wanted), F.lit(label.strip())).otherwise(out)
    return out


def fn_case(params: list, data_type: str) -> Column:
    """Value mapping; unmatched keeps the ORIGINAL value
    (``light_transform.py:1215-1246``)."""
    if len(params) < 2:
        raise ValueError("fn_transform_Case requires >= 2 params")
    origin = _as_column(params[0])
    return _apply_rules(origin, origin, params[1:])


def fn_case_with_default(params: list, data_type: str) -> Column:
    """Value mapping with default; supports compound multi-column form
    ``colA&colB`` with rules ``a1&b1|a2&b2->label``
    (``light_transform.py:1248-1323``)."""
    if len(params) < 2:
        raise ValueError("fn_transform_Case_with_default requires >= 2 params")
    origin_token = params[0]
    default = _default_expr(params[-1])
    rules = params[1:-1] if len(params) > 2 else []

    if isinstance(origin_token, str) and "&" in origin_token:
        col_names = [c.strip() for c in origin_token.split("&")]
        out = default
        for rule in rules:
            if not (isinstance(rule, str) and "->" in rule):
                continue
            values, label = rule.split("->", 1)
            combined = None
            for value in values.split("|"):
                parts = value.split("&")
                cond = None
                for i, col_name in enumerate(col_names):
                    if i < len(parts):
                        term = F.col(col_name) == F.lit(parts[i].strip())
                        cond = term if cond is None else (cond & term)
                if cond is not None:
                    combined = cond if combined is None else (combined | cond)
            if combined is not None:
                out = F.when(combined, F.lit(label.strip())).otherwise(out)
        return out

    origin = _as_column(origin_token)
    return _apply_rules(default, origin, rules)


for _name, _fn, _rt in [
    ("fn_transform_Concatenate", fn_concatenate, "string"),
    ("fn_transform_Concatenate_ws", fn_concatenate_ws, "string"),
    ("fn_transform_ClearString", fn_clear_string, "string"),
    ("fn_transform_DateMagic", fn_date_magic, "date"),
    ("fn_transform_Date", fn_date, "date"),
    ("fn_transform_Datetime", fn_datetime, "timestamp"),
    ("fn_transform_DatetimeMagic", fn_datetime_magic, "timestamp"),
    ("fn_transform_Date_to_String", fn_date_to_string, "string"),
    ("fn_transform_Integer", _cast_fn(T.IntegerType()), "integer"),
    ("fn_transform_Double", _cast_fn(T.DoubleType()), "double"),
    ("fn_transform_Boolean", _cast_fn(T.BooleanType()), "boolean"),
    ("fn_transform_Numeric", fn_numeric, "double"),
    ("fn_transform_PeriodMagic", fn_period_magic, "string"),
    ("fn_transform_ByteMagic", fn_byte_magic, "string"),
    ("fn_transform_Case", fn_case, "string"),
    ("fn_transform_Case_with_default", fn_case_with_default, "string"),
]:
    register_function(_name, _fn, _rt)

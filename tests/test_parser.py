from cdk_datalake_ingest_upeu_spark.functions.parser import (
    ExpressionParser,
    split_projection_list,
)

P = ExpressionParser()


def test_blank_is_none():
    assert P.parse("") is None
    assert P.parse("   ") is None


def test_bare_column():
    node = P.parse("venta_id")
    assert node.kind == "column" and node.name == "venta_id"


def test_simple_call():
    node = P.parse("fn_transform_Integer(x)")
    assert node.kind == "call"
    assert node.name == "fn_transform_Integer"
    assert node.params == ["x"]


def test_nested_call_params_not_split():
    node = P.parse(
        "fn_transform_Date_to_String(fn_transform_DateMagic(f,yyyy-MM-dd),yyyyMM)"
    )
    assert node.params == ["fn_transform_DateMagic(f,yyyy-MM-dd)", "yyyyMM"]


def test_quoted_commas_kept():
    node = P.parse('fn_transform_Case(x,"a,b->L",$D)')
    assert node.params == ["x", '"a,b->L"', "$D"]


def test_rule_params():
    node = P.parse("fn_transform_Case(estado,001|002->Activo,003->Inactivo)")
    assert node.params == ["estado", "001|002->Activo", "003->Inactivo"]


def test_projection_split_respects_parens_and_quotes():
    cols = split_projection_list(
        "a, CONVERT(varchar, b, 120) as b2, LTRIM(c) c2, 'x,y' as lit"
    )
    assert cols == [
        "a",
        "CONVERT(varchar, b, 120) as b2",
        "LTRIM(c) c2",
        "'x,y' as lit",
    ]

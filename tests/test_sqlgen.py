import datetime as dt

from cdk_datalake_ingest_upeu_spark.config.models import TableSpec
from cdk_datalake_ingest_upeu_spark.plans.sqlgen import QueryGenerator
from cdk_datalake_ingest_upeu_spark.plans.strategy import determine_load_strategy


def spec(**kw):
    base = dict(stage_table_name="T", source_table="tbl", source_schema="dbo")
    base.update(kw)
    return TableSpec(**base)


def test_standard_query_projection_and_id_alias():
    g = QueryGenerator(spec(columns="a,b", id_column="a", load_type="full"))
    assert g.standard_query() == "select a as id,a,b from dbo.tbl "


def test_standard_query_filters_full_load_neutralizes_range():
    g = QueryGenerator(
        spec(columns="a", load_type="full", filter_exp='"a > 1"', filter_column="f >= {0}")
    )
    q = g.standard_query()
    assert q.endswith("where a > 1 AND 0=0")


def test_standard_query_incremental_renders_delay_window():
    g = QueryGenerator(
        spec(
            columns="a",
            load_type="incremental",
            filter_column="periodo BETWEEN {0} AND {1}",
            filter_data_type="aje_period",
            delay_incremental_ini="-2",
        )
    )
    q = g.standard_query(now=dt.datetime(2025, 3, 15))
    assert "periodo BETWEEN 202501 AND 202503" in q


def test_join_expr_passthrough():
    g = QueryGenerator(spec(columns="a", join_expr="JOIN dim d ON d.k = tbl.k"))
    assert "from dbo.tbl JOIN dim d ON d.k = tbl.k" in g.standard_query()


def test_min_max_query_shape():
    g = QueryGenerator(spec(filter_exp="x=1"))
    q = g.min_max_query("pk")
    assert q == (
        "SELECT MIN(pk) as min_val, MAX(pk) as max_val FROM dbo.tbl "
        "WHERE pk <> 0 AND x=1"
    )


def test_range_buckets_cover_range_and_include_max():
    g = QueryGenerator(spec())
    bounds = g.range_bucket_bounds(1000, 10_000_000, 10)
    assert len(bounds) == 10
    assert bounds[0][0] == 1000
    assert bounds[-1][1] == 10_000_001  # max + 1
    for (s1, e1), (s2, e2) in zip(bounds, bounds[1:]):
        assert e1 == s2  # contiguous


def test_range_buckets_clamp_small_range():
    g = QueryGenerator(spec())
    bounds = g.range_bucket_bounds(5, 8, 10)  # range 3 < 10 buckets
    assert len(bounds) == 3
    assert bounds[0][0] == 5 and bounds[-1][1] == 9


def test_date_range_queries_split_evenly():
    g = QueryGenerator(spec(columns="a", filter_column="f"))
    qs = g.date_range_queries(
        dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 4), 3
    )
    assert len(qs) == 3
    assert "BETWEEN '2025-01-01 00:00:00' AND '2025-01-02 00:00:00'" in qs[0]
    assert "BETWEEN '2025-01-03 00:00:00' AND '2025-01-04 00:00:00'" in qs[2]


def test_dual_range_predicate_forms():
    g1 = QueryGenerator(spec(filter_column="f"))
    assert g1.dual_range_predicate("1", "2") == "f is not null and f BETWEEN 1 AND 2"
    g2 = QueryGenerator(spec(filter_column="f1,f2"))
    assert g2.dual_range_predicate("1", "2") == (
        "(f1 IS NOT NULL and f1 BETWEEN 1 AND 2) "
        "OR (f2 IS NOT NULL and f2 BETWEEN 1 AND 2)"
    )


def test_dialect_date_literals():
    r = QueryGenerator.render_date_literal
    assert r("2025-01-01 00:00:00", "smalldatetime") == (
        "CONVERT(smalldatetime, '2025-01-01 00:00:00', 120)"
    )
    assert r("2025-01-01 00:00:00.000", "DATE") == (
        "TO_DATE('2025-01-01 00:00:00', 'YYYY-MM-DD HH24:MI:SS')"
    )
    assert r("2025-01-01 00:00:00", "BIGINT").isdigit()


def test_strategy_partitioned_full():
    s = spec(
        load_type="full",
        source_table_type="t",
        partition_column="pk",
        columns="a,b",
    )
    plan = determine_load_strategy(s, min_max_probe=lambda c: (1, 101))
    assert plan.kind == "partitioned_full"
    assert plan.num_splits == 10
    assert len(plan.queries) == 10
    assert plan.predicates[0].startswith("pk >= 1 AND pk < ")
    assert plan.predicates[-1].endswith("pk < 102")


def test_strategy_probe_failure_falls_back():
    s = spec(load_type="full", source_table_type="t", partition_column="pk", columns="a")
    plan = determine_load_strategy(s, min_max_probe=lambda c: (None, None))
    assert plan.kind == "standard"


def test_strategy_between_date():
    s = spec(
        load_type="between-date",
        columns="a",
        filter_column="f",
        start_value="2025-01-01 00:00:00",
        end_value="2025-01-04 00:00:00",
    )
    plan = determine_load_strategy(s)
    assert plan.kind == "between_date"
    assert len(plan.queries) == 3


def test_strategy_standard_default():
    plan = determine_load_strategy(spec(load_type="full", columns="a"))
    assert plan.kind == "standard"
    assert plan.queries == ["select a from dbo.tbl "]

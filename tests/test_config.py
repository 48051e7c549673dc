import os

import pytest

from cdk_datalake_ingest_upeu_spark.config import (
    columns_for_table,
    endpoint_for,
    load_config_csv,
    table_spec_for,
)

REF_CSV_DIR = "/root/reference/artifacts/configuration/csv"

TABLES_CSV = (
    "COLUMNS;LOAD_TYPE;PARTITION_MODE;PARTITION_COLUMN;DELAY_INCREMENTAL_INI;"
    "DELAY_INCREMENTAL_END;FILTER_COLUMN;FILTER_DATA_TYPE;FILTER_EXP;ID_COLUMN;"
    "JOIN_EXPR;PROCESS_ID;SOURCE_SCHEMA;SOURCE_TABLE;SOURCE_TABLE_TYPE;"
    "STAGE_TABLE_NAME;JOB_EXTRACT_MAX_CAPACITY;STATUS;EXTRACTION_METADATA;PARTITION_FORMAT\n"
    'a,b,c;;AUTO;pk;-2;0;"fecha >= {0}";aje_period;"x > 1";pk;;"10,20";dbo;ventas;t;'
    "VENTAS;2;A;;year={YYYY}/month={MM}\n"
    'x,y;full;NONE;;-2;0;;;;;;30;dbo;"""clientes""";m;CLIENTES;2;A;;\n'
)

COLUMNS_CSV = (
    "COLUMN_NAME;COLUMN_ID;IS_FILTER_DATE;IS_ID;IS_ORDER_BY;IS_PARTITION;"
    "NEW_DATA_TYPE;TABLE_NAME;TRANSFORMATION\n"
    "venta_id;2;;T;T;;int;VENTAS;fn_transform_Integer(venta_id)\n"
    "fecha;1;T;;;true;date;VENTAS;fn_transform_DateMagic(fecha,yyyy-MM-dd)\n"
    "otra;5;;;;;string;OTRA;x\n"
)

CREDS_CSV = (
    "ENDPOINT_NAME;ENV;BD_TYPE;SRC_SERVER_NAME;DB_PORT_NUMBER;SRC_DB_NAME;SRC_DB_USERNAME\n"
    "PEUPEU;DEV;mssql;db.host;1433;ventasdb;svc_user\n"
)


def test_table_spec_parsing_and_quirks():
    rows = load_config_csv(TABLES_CSV, is_text=True)
    spec = table_spec_for(rows, "ventas")
    assert spec.stage_table_name == "VENTAS"
    # quote sanitization: '"fecha >= {0}"' -> 'fecha >= {0}'
    assert spec.filter_column == "fecha >= {0}"
    assert spec.filter_exp == "x > 1"
    assert spec.process_ids() == ["10", "20"]
    # blank LOAD_TYPE + SOURCE_TABLE_TYPE='t' defaults to incremental
    assert spec.load_type == "incremental"

    spec2 = table_spec_for(rows, "clientes")
    # quote sanitization: csv-doubled quotes collapse, outer pair stripped
    assert spec2.source_table == "clientes"
    assert spec2.load_type == "full"


def test_days_off_defaulting_on_salesforce_endpoint():
    """Blank LOAD_TYPE + SOURCE_TABLE_TYPE='t' + SALESFORCE_ING endpoint
    defaults to days_off with NUM_DAYS=10 (extract_data_spark.py:188-205);
    other endpoints keep the incremental default."""
    rows = load_config_csv(TABLES_CSV, is_text=True)
    spec = table_spec_for(rows, "ventas", endpoint_name="SALESFORCE_ING")
    assert spec.load_type == "days_off"
    assert spec.num_days == "10"
    # non-transactional tables stay full regardless of endpoint
    spec2 = table_spec_for(rows, "clientes", endpoint_name="SALESFORCE_ING")
    assert spec2.load_type == "full"
    # any other endpoint: incremental
    spec3 = table_spec_for(rows, "ventas", endpoint_name="PEUPEU")
    assert spec3.load_type == "incremental"


def test_days_off_strategy_builds_trailing_window():
    import datetime as dt

    from cdk_datalake_ingest_upeu_spark.config.models import TableSpec
    from cdk_datalake_ingest_upeu_spark.plans.strategy import determine_load_strategy

    spec = TableSpec(
        stage_table_name="T",
        source_table="t",
        source_table_type="t",
        load_type="days_off",
        num_days="10",
        filter_column="modified_at",
    )
    plan = determine_load_strategy(spec, now=dt.datetime(2024, 3, 15, 12, 0, 0))
    assert plan.kind == "days_off"
    assert plan.num_splits == 1 and len(plan.queries) == 1
    assert (
        plan.predicates[0]
        == "modified_at is not null and modified_at BETWEEN "
        "'2024-03-05 12:00:00' AND '2024-03-15 12:00:00'"
    )
    # no filter column -> falls through to the standard single query
    spec.filter_column = ""
    assert determine_load_strategy(spec, now=dt.datetime(2024, 3, 15)).kind == "standard"


def test_force_full_load_override():
    rows = load_config_csv(TABLES_CSV, is_text=True)
    spec = table_spec_for(rows, "ventas", force_full_load=True)
    assert spec.load_type == "full"


def test_columns_sorted_and_flagged():
    rows = load_config_csv(COLUMNS_CSV, is_text=True)
    cols = columns_for_table(rows, "ventas")
    assert [c.name for c in cols] == ["fecha", "venta_id"]  # sorted by COLUMN_ID
    assert cols[0].is_filter_date and cols[0].is_partition
    assert cols[1].is_id and cols[1].is_order_by


def test_endpoint_jdbc_url():
    rows = load_config_csv(CREDS_CSV, is_text=True)
    ep = endpoint_for(rows, "PEUPEU", "dev")
    assert ep.jdbc_url() == "jdbc:sqlserver://db.host:1433;databaseName=ventasdb"
    assert "SQLServerDriver" in ep.jdbc_driver()


@pytest.mark.skipif(not os.path.isdir(REF_CSV_DIR), reason="reference csvs absent")
def test_loads_reference_shipped_config():
    """The engine's loader must ingest the reference's actual shipped CSVs
    (latin-1, ';', embedded quotes) without modification."""
    tables = load_config_csv(os.path.join(REF_CSV_DIR, "tables.csv"))
    columns = load_config_csv(os.path.join(REF_CSV_DIR, "columns.csv"))
    assert len(tables) >= 30
    active = [r for r in tables if (r.get("STATUS") or "").upper() == "A"]
    specs = [table_spec_for(tables, r["STAGE_TABLE_NAME"]) for r in active]
    assert all(s.load_type in ("full", "incremental", "between-date") for s in specs)
    # every active table's columns parse into specs
    for s in specs[:10]:
        cols = columns_for_table(columns, s.stage_table_name)
        assert cols, f"no columns for {s.stage_table_name}"

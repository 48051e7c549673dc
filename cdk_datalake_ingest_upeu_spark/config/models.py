"""Config dataclasses — the engine's "DDL".

Field-for-field equivalents of the reference's configuration model:

- ``TableSpec``  <- one row of ``tables.csv`` (header at reference
  ``artifacts/configuration/csv/tables.csv:1``; dataclass parity with
  ``light_transform.py:535-546`` plus the extraction-side fields used by
  ``extract_data_spark.py``).
- ``ColumnSpec`` <- one row of ``columns.csv`` (header at
  ``columns.csv:1``; dataclass parity with ``light_transform.py:524-533``).
- ``EndpointSpec`` <- one row of ``credentials.csv``
  (``light_transform.py:548-555``, JDBC fields from
  ``extract_data_spark.py:244-295``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _flag(value: str | None) -> bool:
    """Truthy flag parse: reference accepts T/true/1/yes/y
    (``light_transform.py:1624-1627``)."""
    if value is None:
        return False
    return value.strip().lower() in {"t", "true", "1", "yes", "y"}


@dataclass
class ColumnSpec:
    """Per-column type + transform expression."""

    name: str
    column_id: int
    data_type: str = "string"
    transformation: str = ""
    is_partition: bool = False
    is_id: bool = False
    is_order_by: bool = False
    is_filter_date: bool = False

    @classmethod
    def from_row(cls, row: dict[str, str]) -> "ColumnSpec":
        return cls(
            name=row.get("COLUMN_NAME", ""),
            column_id=int(row.get("COLUMN_ID", "0") or 0),
            data_type=row.get("NEW_DATA_TYPE", "string") or "string",
            transformation=row.get("TRANSFORMATION", "") or "",
            is_partition=_flag(row.get("IS_PARTITION", "")),
            is_id=(row.get("IS_ID", "") or "").strip().upper() == "T",
            is_order_by=(row.get("IS_ORDER_BY", "") or "").strip().upper() == "T",
            is_filter_date=(row.get("IS_FILTER_DATE", "") or "").strip().upper() == "T",
        )


@dataclass
class TableSpec:
    """Per-table load configuration."""

    stage_table_name: str
    source_table: str
    source_schema: str = ""
    source_table_type: str = "m"  # 't' = transactional, 'm' = master
    load_type: str = ""  # full | incremental | between-date | '' (defaulted)
    columns: str = "*"  # projection list (may embed source-SQL exprs)
    id_column: str = ""
    join_expr: str = ""
    filter_exp: str = ""
    filter_column: str = ""  # may be templated with {0}/{1}; comma = dual form
    filter_data_type: str = ""  # aje_period | aje_date | aje_processperiod | ...
    partition_column: str = ""
    partition_mode: str = ""
    delay_incremental_ini: str = "-2"
    delay_incremental_end: str = "0"
    process_id: str = ""
    partition_format: str = ""
    num_days: str = ""
    start_value: str = ""
    end_value: str = ""
    status: str = "A"
    extra: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_row(cls, row: dict[str, str]) -> "TableSpec":
        get = lambda k, d="": (row.get(k, d) or d)  # noqa: E731
        return cls(
            stage_table_name=get("STAGE_TABLE_NAME"),
            source_table=get("SOURCE_TABLE"),
            source_schema=get("SOURCE_SCHEMA"),
            source_table_type=get("SOURCE_TABLE_TYPE", "m"),
            load_type=get("LOAD_TYPE").strip().lower(),
            columns=get("COLUMNS", "*"),
            id_column=get("ID_COLUMN"),
            join_expr=get("JOIN_EXPR"),
            filter_exp=get("FILTER_EXP"),
            filter_column=get("FILTER_COLUMN"),
            filter_data_type=get("FILTER_DATA_TYPE"),
            partition_column=get("PARTITION_COLUMN").strip(),
            partition_mode=get("PARTITION_MODE"),
            delay_incremental_ini=get("DELAY_INCREMENTAL_INI", "-2"),
            delay_incremental_end=get("DELAY_INCREMENTAL_END", "0"),
            process_id=get("PROCESS_ID"),
            partition_format=get("PARTITION_FORMAT"),
            num_days=get("NUM_DAYS"),
            start_value=get("START_VALUE"),
            end_value=get("END_VALUE"),
            status=get("STATUS", "A"),
            extra={k: v for k, v in row.items() if k not in _KNOWN_TABLE_FIELDS},
        )

    def process_ids(self) -> list[str]:
        """Multi-process values like ``"10,20,70"`` (reference ``app.py:43-55``)."""
        return [p.strip() for p in self.process_id.split(",") if p.strip()]


_KNOWN_TABLE_FIELDS = {
    "STAGE_TABLE_NAME",
    "SOURCE_TABLE",
    "SOURCE_SCHEMA",
    "SOURCE_TABLE_TYPE",
    "LOAD_TYPE",
    "COLUMNS",
    "ID_COLUMN",
    "JOIN_EXPR",
    "FILTER_EXP",
    "FILTER_COLUMN",
    "FILTER_DATA_TYPE",
    "PARTITION_COLUMN",
    "PARTITION_MODE",
    "DELAY_INCREMENTAL_INI",
    "DELAY_INCREMENTAL_END",
    "PROCESS_ID",
    "PARTITION_FORMAT",
    "NUM_DAYS",
    "START_VALUE",
    "END_VALUE",
    "STATUS",
}


@dataclass
class EndpointSpec:
    """Source-database endpoint (JDBC boundary)."""

    endpoint_name: str
    environment: str = ""
    db_type: str = ""  # mssql | mysql | oracle
    server: str = ""
    port: str = ""
    db_name: str = ""
    username: str = ""
    password: str = ""

    @classmethod
    def from_row(cls, row: dict[str, str]) -> "EndpointSpec":
        get = lambda k, d="": (row.get(k, d) or d)  # noqa: E731
        return cls(
            endpoint_name=get("ENDPOINT_NAME"),
            environment=get("ENV"),
            db_type=get("BD_TYPE"),
            server=get("SRC_SERVER_NAME"),
            port=get("DB_PORT_NUMBER"),
            db_name=get("SRC_DB_NAME"),
            username=get("SRC_DB_USERNAME"),
        )

    def jdbc_url(self) -> str:
        """Per-engine JDBC URL shapes (reference ``extract_data_spark.py:261-271``)."""
        if self.db_type == "oracle":
            return f"jdbc:oracle:thin:@{self.server}:{self.port}:{self.db_name}"
        if self.db_type == "mssql":
            return (
                f"jdbc:sqlserver://{self.server}:{self.port};databaseName={self.db_name}"
            )
        if self.db_type == "mysql":
            return f"jdbc:mysql://{self.server}:{self.port}/{self.db_name}"
        raise ValueError(f"unsupported db_type: {self.db_type}")

    def jdbc_driver(self) -> str:
        return {
            "oracle": "oracle.jdbc.driver.OracleDriver",
            "mssql": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
            "mysql": "com.mysql.cj.jdbc.Driver",
        }[self.db_type]

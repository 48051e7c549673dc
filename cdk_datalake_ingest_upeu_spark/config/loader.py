"""Config CSV loading with the reference's sanitization quirks.

The reference ships latin-1, ``;``-delimited CSVs whose values may be
wrapped in ``"`` or ``\"\"\"`` (triple quotes); the loader strips both
(reference ``light_transform.py:579-617``). Load-type defaulting rules
follow ``extract_data_spark.py:188-205``.
"""

from __future__ import annotations

import csv
import io
import os

from cdk_datalake_ingest_upeu_spark.config.models import (
    ColumnSpec,
    EndpointSpec,
    TableSpec,
)


def _sanitize(value: str | None) -> str | None:
    if not isinstance(value, str):
        return value
    clean = value.replace('"""', '"')
    if clean.startswith('"') and clean.endswith('"') and len(clean) >= 2:
        clean = clean[1:-1]
    return clean


def load_config_csv(path_or_text: str, *, is_text: bool = False) -> list[dict[str, str]]:
    """Load a ``;``-delimited latin-1 config CSV into sanitized dict rows."""
    if is_text:
        content = path_or_text
    else:
        with open(os.fspath(path_or_text), encoding="latin-1") as fh:
            content = fh.read()
    rows = []
    for row in csv.DictReader(io.StringIO(content), delimiter=";"):
        rows.append({k: _sanitize(v) for k, v in row.items()})
    return rows


def columns_for_table(columns_rows: list[dict[str, str]], table_name: str) -> list[ColumnSpec]:
    """Column specs for one stage table, sorted by COLUMN_ID
    (ordering per reference ``light_transform.py:706``)."""
    specs = [
        ColumnSpec.from_row(row)
        for row in columns_rows
        if (row.get("TABLE_NAME", "") or "").upper() == table_name.upper()
    ]
    return sorted(specs, key=lambda c: c.column_id)


def table_spec_for(
    tables_rows: list[dict[str, str]],
    table_name: str,
    *,
    endpoint_name: str = "",
    force_full_load: bool = False,
) -> TableSpec:
    """Find + normalize a table spec, applying LOAD_TYPE defaulting.

    Defaulting (reference ``extract_data_spark.py:188-205``): blank
    LOAD_TYPE on a transactional table (``SOURCE_TABLE_TYPE=='t'``)
    becomes ``days_off`` with ``NUM_DAYS=10`` on the ``SALESFORCE_ING``
    endpoint (a trailing re-extract window — the API has no reliable
    incremental cursor) and ``incremental`` on every other endpoint;
    non-transactional tables default to ``full``. FORCE_FULL_LOAD turns
    ``incremental`` into ``full``.
    """
    for row in tables_rows:
        if (row.get("STAGE_TABLE_NAME", "") or "").upper() == table_name.upper():
            spec = TableSpec.from_row(row)
            if not spec.load_type:
                if spec.source_table_type == "t":
                    if endpoint_name == "SALESFORCE_ING":
                        spec.load_type = "days_off"
                        if not (spec.num_days or "").strip():
                            spec.num_days = "10"
                    else:
                        spec.load_type = "incremental"
                else:
                    spec.load_type = "full"
            if force_full_load and spec.load_type == "incremental":
                spec.load_type = "full"
            return spec
    raise KeyError(f"table config not found: {table_name}")


def endpoint_for(
    credentials_rows: list[dict[str, str]], endpoint_name: str, environment: str
) -> EndpointSpec:
    for row in credentials_rows:
        if (
            row.get("ENDPOINT_NAME", "") == endpoint_name
            and (row.get("ENV", "") or "").upper() == environment.upper()
        ):
            return EndpointSpec.from_row(row)
    raise KeyError(f"endpoint config not found: {endpoint_name}/{environment}")

"""Regenerate workloads._MICRO_CANON_COLS: type every oracle's result
relation on DuckDB and list the DOUBLE/FLOAT output columns — exactly
the columns whose hashed text would otherwise depend on engine float
formatting. Run after adding/altering oracles; paste the printed dict
over _MICRO_CANON_COLS (entries already canonicalized report no double
columns and drop out automatically, so the map converges).

    python tools/list_double_cols.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # import AFTER arg parsing: the module applies the current canon map
    from cdk_datalake_ingest_upeu_spark.workloads import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    typed = {name: con.sql(sql) for name, sql in ORACLES.items()}
    print("_MICRO_CANON_COLS = {")
    for name, rel in typed.items():
        cols = [
            c
            for c, tp in zip(rel.columns, rel.types)
            if str(tp) in ("DOUBLE", "FLOAT")
        ]
        if cols:
            print(f'    "{name}": {cols!r},')
    print("}")
    # timestamp-typed outputs (workloads._TS_CANON_COLS candidates —
    # already-wrapped oracles type as plain TIMESTAMP and stay listed;
    # the wrap is idempotent)
    print("_TS_CANON_COLS = {")
    for name, rel in typed.items():
        cols = [
            c
            for c, tp in zip(rel.columns, rel.types)
            if "TIMESTAMP" in str(tp)
        ]
        if cols:
            print(f'    "{name}": {cols!r},')
    print("}")


if __name__ == "__main__":
    main()

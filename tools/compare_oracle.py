"""Local stand-in for the driver's correctness gate.

Runs every QUERIES entry on Spark and its ORACLES SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
order-insensitive EXACT value text (floats by repr, no rounding — the
driver hashes value text, so this tool must fail wherever the driver
would). Oracle columns typed HUGEINT or DECIMAL(p>18) are rejected
outright: DuckDB promotes integer sums to int128 whose driver-side text
differs from Spark's BIGINT (the r3 11-query hash-red class), and wide
decimals go float-lossy through a dataframe fetch (the r6
corpus_checksum driver-red). Usage:

    python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdk_datalake_ingest_upeu_spark import get_spark  # noqa: E402
from cdk_datalake_ingest_upeu_spark.workloads import ORACLES, QUERIES  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact text, NOT rounded: the driver hashes value text, so a
        # summation-order flip in the 9th digit must FAIL here too (the
        # r3 lesson: 9-digit rounding hid 11 driver hash-reds)
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # strict text compare: Decimal("1.50") == Decimal("1.5") in
        # Python but the driver hashes the text, where scale shows
        return str(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return norm_cell(v.item())
        if isinstance(v, np.ndarray):
            return tuple(norm_cell(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    report_path = None
    for a in sys.argv[1:]:
        if a.startswith("--report="):
            report_path = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    unknown = only - set(QUERIES)
    if unknown:
        print(f"no such query: {sorted(unknown)}; known: {sorted(QUERIES)}")
        sys.exit(2)

    # no console progress bar: its \r redraws clobber the per-query
    # "ok" lines this tool exists to print (the skill's tr-hack cause)
    spark = get_spark(
        "oracle-compare",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    report = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            report[name] = {"status": "spark_error", "err": str(exc)[:300]}
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        sql = ORACLES.get(name)
        if sql is None:
            report[name] = {"status": "rows_only", "spark_rows": len(s_rows)}
            print(f"ok    {name}: rows-only ({len(s_rows)} rows)")
            continue
        # Structural gate (r5 lesson): this tool compares floats via
        # Python repr, which CANNOT see Java-vs-DuckDB text divergence
        # (1.0E-4 vs 0.0001, NaN vs nan) — the exact local-green /
        # driver-red failure mode. Hash-checked queries must therefore
        # emit NO float-typed output columns at all; canonicalize via
        # workloads._MICRO_CANON_COLS (fixed-point micro-units).
        fl = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("double", "float")
        ]
        if fl:
            failures.append(name)
            report[name] = {"status": "float_output", "cols": fl}
            print(
                f"FAIL  {name}: float-typed output column(s) {fl} — "
                "engine float TEXT is not hash-portable; add the query "
                "to workloads._MICRO_CANON_COLS"
            )
            continue
        try:
            res = con.sql(sql)
            o_cols = list(res.columns)
            o_types = [str(t) for t in res.types]
            o_rows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            report[name] = {"status": "duckdb_error", "err": str(exc)[:300]}
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue

        # DuckDB sum(INTEGER-family) returns HUGEINT (int128); the
        # driver-side conversion stringifies it differently from Spark's
        # BIGINT and the value hash fails even when numbers agree.  Ban
        # it outright: CAST(sum(...) AS BIGINT) in the oracle SQL.
        # Same ban for DECIMAL wider than 18 digits (r6 corpus_checksum
        # driver-red): exact in-engine, but a dataframe-path fetch turns
        # DuckDB DECIMAL(38,0) into float64 (6.97576082990215e+16) while
        # Spark's decimal text stays exact — emit digit STRINGs instead.
        def _wide(t: str) -> bool:
            u = t.upper()
            if "HUGEINT" in u:
                return True
            if u.startswith("DECIMAL("):
                prec = int(u.split("(")[1].split(",")[0])
                return prec > 18
            return False

        huge = [c for c, t in zip(o_cols, o_types) if _wide(t)]
        if huge:
            failures.append(name)
            report[name] = {"status": "wide_numeric", "cols": huge}
            print(
                f"FAIL  {name}: oracle column(s) {huge} typed HUGEINT/"
                "DECIMAL(p>18) — not dataframe-fetch-portable; CAST to "
                "BIGINT or render as a digit VARCHAR"
            )
            continue

        sc, sr = frame_to_rows(s_cols, s_rows)
        oc, orows = frame_to_rows(o_cols, o_rows)
        if sc != oc:
            failures.append(name)
            report[name] = {"status": "schema_mismatch", "spark": sc, "oracle": oc}
            print(f"FAIL  {name}: columns differ spark={sc} oracle={oc}")
            continue
        if len(sr) != len(orows):
            failures.append(name)
            report[name] = {"status": "rowcount_mismatch", "spark_rows": len(sr), "oracle_rows": len(orows)}
            print(f"FAIL  {name}: rowcount spark={len(sr)} oracle={len(orows)}")
            continue
        bad = [(a, b) for a, b in zip(sr, orows) if a != b]
        if bad:
            failures.append(name)
            report[name] = {"status": "value_mismatch", "n_bad": len(bad), "n_rows": len(sr)}
            print(f"FAIL  {name}: {len(bad)}/{len(sr)} rows differ; first: ")
            print("  spark :", bad[0][0])
            print("  oracle:", bad[0][1])
            continue
        report[name] = {"status": "match", "rows": len(sr)}
        print(f"ok    {name}: {len(sr)} rows match")

    if report_path:
        import json

        with open(report_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(report),
                    "n_match": sum(1 for v in report.values() if v["status"] == "match"),
                    "n_rows_only": sum(1 for v in report.values() if v["status"] == "rows_only"),
                    "n_fail": len(failures),
                    "queries": report,
                },
                f,
                indent=1,
                sort_keys=True,
            )
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()

"""Pushdown SQL generation — the engine's "logical plan" for the JDBC boundary.

The reference's only query planner is a SQL-string builder executed by
the source RDBMS (``extract_data_spark.py:653-690`` and
``layer/raw/query_generator.py``). We keep the same generated shapes for
real JDBC sources, and additionally express every generated predicate as
a Spark ``Column`` so the identical filter can be applied to a
DataFrame-backed source (hermetic tests, parquet-staged replicas).

Pieces re-implemented here:

- P1/P2 projection + ``{ID_COLUMN} as id`` aliasing
  (``extract_data_spark.py:653-660``)
- P4 static FILTER_EXP, P5 templated ``{0}``/``{1}`` range filters
  (``extract_data_spark.py:670-685``)
- P6 dual-column date filter (``extract_data_spark.py:613-621``)
- P7 dialect date literal rendering (``extract_data_spark.py:626-651``)
- A1 min/max bounds probe (``extract_data_spark.py:551-576``)
- X1 range buckets / X2 date-range splits
  (``extract_data_spark.py:578-602,739-771``). At execution time these
  become Spark JDBC ``predicates=[...]`` — Spark runs one source query
  per bucket in parallel, which is exactly the reference's thread pool.
"""

from __future__ import annotations

import datetime as dt

from cdk_datalake_ingest_upeu_spark.config.models import TableSpec
from cdk_datalake_ingest_upeu_spark.functions.dates import delay_window_limits


class QueryGenerator:
    def __init__(self, spec: TableSpec):
        self.spec = spec

    # -- projection ---------------------------------------------------------

    def projection(self) -> str:
        cols = self.spec.columns or "*"
        if self.spec.id_column:
            return f"{self.spec.id_column} as id,{cols}"
        return cols

    def from_clause(self) -> str:
        schema = self.spec.source_schema
        table = self.spec.source_table
        base = f"{schema}.{table}" if schema else table
        join = f" {self.spec.join_expr}" if self.spec.join_expr else ""
        return f"{base}{join}"

    # -- filters -------------------------------------------------------------

    def where_clause(self, *, now: dt.datetime | None = None) -> str:
        """FILTER_EXP AND (templated FILTER_COLUMN) — full loads neutralize
        the range term to ``0=0`` (``extract_data_spark.py:670-690``)."""
        has_exp = bool(self.spec.filter_exp.strip())
        has_col = bool(self.spec.filter_column.strip())
        if not has_exp and not has_col:
            return ""
        if self.spec.load_type == "full":
            range_term = "0=0"
        else:
            lo, hi = delay_window_limits(
                self.spec.delay_incremental_ini, self.spec.filter_data_type, now=now
            )
            range_term = (
                self.spec.filter_column.replace("{0}", lo).replace("{1}", hi).replace('"', "")
                if has_col
                else "1=1"
            )
        exp_term = self.spec.filter_exp.replace('"', "") if has_exp else "0=0"
        return f"{exp_term} AND {range_term}"

    def dual_range_predicate(self, start: str, end: str) -> str:
        """BETWEEN filter; comma-separated FILTER_COLUMN gets the two-column
        null-guarded OR form (``extract_data_spark.py:613-621``)."""
        fc = self.spec.filter_column
        if "," in fc:
            c1, c2 = (c.strip() for c in fc.split(",", 1))
            return (
                f"({c1} IS NOT NULL and {c1} BETWEEN {start} AND {end}) "
                f"OR ({c2} IS NOT NULL and {c2} BETWEEN {start} AND {end})"
            )
        return f"{fc} is not null and {fc} BETWEEN {start} AND {end}"

    @staticmethod
    def render_date_literal(value: str, dialect_type: str) -> str:
        """Dialect-specific datetime literal (``extract_data_spark.py:626-651``)."""
        if dialect_type == "smalldatetime":
            return f"CONVERT(smalldatetime, '{value}', 120)"
        if dialect_type == "DATE":
            return f"TO_DATE('{value[:19]}', 'YYYY-MM-DD HH24:MI:SS')"
        if dialect_type == "TIMESTAMP(6)":
            return f"TO_TIMESTAMP('{value}', 'YYYY-MM-DD HH24:MI:SS.FF')"
        if dialect_type == "SQL_DATETIME":
            return f"CONVERT(DATETIME, '{value}',  102)"
        if dialect_type == "BIGINT":
            stamp = dt.datetime.strptime(value, "%Y-%m-%d %H:%M:%S")
            return str(int(stamp.timestamp()))
        return f"'{value}'"

    # -- whole queries --------------------------------------------------------

    def standard_query(self, *, now: dt.datetime | None = None) -> str:
        q = f"select {self.projection()} from {self.from_clause()} "
        where = self.where_clause(now=now)
        if where:
            q += f"where {where}"
        return q

    def min_max_query(self, partition_column: str) -> str:
        q = (
            f"SELECT MIN({partition_column}) as min_val, MAX({partition_column}) as max_val "
            f"FROM {self.from_clause()} WHERE {partition_column} <> 0"
        )
        if self.spec.filter_exp.strip():
            q += f" AND {self.spec.filter_exp}"
        return q

    def range_bucket_bounds(
        self, min_val: int, max_val: int, num_buckets: int
    ) -> list[tuple[int, int]]:
        """Contiguous ``[start, end)`` integer buckets; the last bucket's end
        is max+1 so the max value is included (``extract_data_spark.py:578-602``)."""
        range_size = max_val - min_val
        n = min(num_buckets, max(1, range_size)) if range_size < num_buckets else num_buckets
        increment = max(1, range_size // n)
        bounds = []
        for i in range(n):
            start = min_val + increment * i
            end = min_val + increment * (i + 1)
            if i == n - 1:
                end = max_val + 1
            bounds.append((start, end))
        return bounds

    def partitioned_queries(
        self, partition_column: str, min_val: int, max_val: int, num_buckets: int
    ) -> list[str]:
        out = []
        for start, end in self.range_bucket_bounds(min_val, max_val, num_buckets):
            q = (
                f"SELECT {self.projection()} FROM {self.from_clause()} "
                f"WHERE {partition_column} >= {start} AND {partition_column} < {end}"
            )
            if self.spec.filter_exp.strip():
                q += f" AND ({self.spec.filter_exp})"
            out.append(q)
        return out

    def range_bucket_predicates(
        self, partition_column: str, min_val: int, max_val: int, num_buckets: int
    ) -> list[str]:
        """The bucket WHERE-fragments alone — feed directly to
        ``spark.read.jdbc(..., predicates=...)`` for a parallel scan."""
        return [
            f"{partition_column} >= {start} AND {partition_column} < {end}"
            for start, end in self.range_bucket_bounds(min_val, max_val, num_buckets)
        ]

    def date_range_predicates(
        self,
        start: dt.datetime,
        end: dt.datetime,
        splits: int,
        dialect_type: str = "",
    ) -> list[str]:
        """The BETWEEN-slice WHERE fragments alone — feed to JDBC
        ``predicates=[...]`` or push down onto a parquet replica."""
        delta = (end - start) / splits
        out = []
        for i in range(splits):
            lo = start + delta * i
            hi = start + delta * (i + 1)
            lo_s = lo.strftime("%Y-%m-%d %H:%M:%S")
            hi_s = hi.strftime("%Y-%m-%d %H:%M:%S")
            if dialect_type:
                lo_r = self.render_date_literal(lo_s, dialect_type)
                hi_r = self.render_date_literal(hi_s, dialect_type)
            else:
                lo_r, hi_r = f"'{lo_s}'", f"'{hi_s}'"
            out.append(self.dual_range_predicate(lo_r, hi_r))
        return out

    def date_range_queries(
        self,
        start: dt.datetime,
        end: dt.datetime,
        splits: int,
        dialect_type: str = "",
    ) -> list[str]:
        """X2: split a datetime span into equal BETWEEN slices
        (``extract_data_spark.py:739-771``)."""
        base = f"select {self.projection()} from {self.from_clause()}"
        return [
            f"{base} WHERE {pred}"
            for pred in self.date_range_predicates(start, end, splits, dialect_type)
        ]

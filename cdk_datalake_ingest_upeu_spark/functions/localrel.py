"""Small literal DataFrames as single Arrow batches.

``spark.createDataFrame(list_of_rows, schema)`` parallelizes the rows
into ``defaultParallelism`` pickled partitions, and EVERY downstream
job re-evaluates those partitions through Python workers — measured at
local[32] (r15): ~5 s for a 1-row parquet WRITE, ~0.4 s per count.
The engine builds dozens of such frames on hot query paths (result
assembly rows, streaming sentinel drops, probe/query literals), so the
per-frame overhead is pure serial floor (guide §1.2 / §4: remove the
Python boundary where it buys nothing).

:func:`rows_df` ships the same rows as ONE Arrow record batch instead
(``createDataFrame(pyarrow.Table)``): the rows become a JVM-side local
relation — ~0.16 s for the same 1-row write, and downstream jobs never
touch a Python worker. NULL fidelity is exact: the rows are built into
a ``pyarrow.Table`` against the Arrow schema derived from the Spark
schema, so numeric ``None`` stays NULL (the pandas route would coerce
it to NaN) and NaN stays NaN. Verified equivalent (schema AND rows)
against the classic path for long/double/string/boolean/int/smallint,
NULLs and NaNs, timestamps, dates, and array columns.

Any conversion the Arrow path cannot express falls back to the classic
``createDataFrame`` — same results, just slower.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for SMALL literal row
    lists, via one Arrow batch (no Python-worker re-evaluation in
    downstream jobs). ``schema`` is a DDL string or StructType;
    ``rows`` a list of tuples/Rows."""
    from pyspark.sql.types import TimestampType, _parse_datatype_string

    st = (
        schema
        if isinstance(schema, StructType)
        else _parse_datatype_string(schema)
    )
    rows = list(rows)  # one-shot iterables must survive the fallback
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        # Equivalence caveats (review-pinned): dict rows would zip into
        # their KEYS, and naive datetimes are read as UTC by Arrow but
        # as session-local by classic createDataFrame — both engines
        # here pin session tz to UTC, but this is a general utility, so
        # fall back rather than silently diverge.
        if any(isinstance(r, dict) for r in rows):
            return spark.createDataFrame(rows, st)
        if any(
            isinstance(f.dataType, TimestampType) for f in st.fields
        ) and spark.conf.get("spark.sql.session.timeZone", "UTC") != "UTC":
            return spark.createDataFrame(rows, st)
        arrow_schema = to_arrow_schema(st)
        names = st.names
        tbl = pa.Table.from_pylist(
            [dict(zip(names, r)) for r in rows], schema=arrow_schema
        )
        out = spark.createDataFrame(tbl)
        # belt and braces: the Arrow round-trip must land the EXACT
        # Spark schema the caller declared, else use the classic path
        if out.schema != st:
            return spark.createDataFrame(rows, st)
        return out
    except Exception:
        return spark.createDataFrame(rows, st)

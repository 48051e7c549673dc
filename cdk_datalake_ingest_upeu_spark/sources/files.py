"""File sources & sinks for the raw zone.

Raw-zone parity with the reference:

- partitioned snappy-Parquet landing (S6, ``extract_data_spark.py:453-494``)
- pipe-delimited, QUOTE_ALL csv.gz variant (S8,
  ``query_executor.py:149-235`` / ``csv_formatter.py:10-49``)
- schema-only materialization for empty extracts (S13,
  ``extract_data_spark.py:790-795``)
- partition-directory reads with optional cache (S4,
  ``light_transform.py:1739-1784``)

Spark's ``mode("overwrite")`` subsumes the reference's delete-prefix
step (S12); retries around writes (S7) are unnecessary under Spark's
task retry machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from cdk_datalake_ingest_upeu_spark.functions.localrel import rows_df as _rows_df


def read_raw_parquet(
    spark: SparkSession, path: str, *, cache: bool = False
) -> DataFrame:
    df = spark.read.parquet(path)
    return df.cache() if cache else df


def nanos_ts_columns(path: str) -> set[str]:
    """Column names stored as TIMESTAMP(NANOS) in the parquet footer.

    Under ``spark.sql.legacy.parquet.nanosAsLong`` these read as BIGINT
    and are indistinguishable from genuine longs without the footer —
    one cheap metadata read restores the type for any table/column
    (source drops have landed as nanos, naive micros, and UTC-adjusted
    micros in different rounds)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:  # pragma: no cover - multi-file directory datasets
        return set()
    return {
        f.name
        for f in schema
        if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
    }


def normalize_timestamp_shapes(
    spark: SparkSession, df: DataFrame, path: str
) -> DataFrame:
    """Physical-shape normalization at the ingest boundary: restore
    nanos-as-long columns to TIMESTAMP (truncated to micros) and cast
    TIMESTAMP_NTZ to session-zone TIMESTAMP (value-preserving when the
    session is pinned UTC). Downstream operators then see ONE timestamp
    shape no matter which variant the source wrote."""
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    for cname in nanos_ts_columns(path):
        if dtypes.get(cname) == "bigint":
            df = df.withColumn(
                cname, F.timestamp_micros(F.expr(f"`{cname}` div 1000"))
            )
    for cname, ctype in df.dtypes:
        if ctype == "timestamp_ntz":
            df = df.withColumn(cname, F.col(cname).cast("timestamp"))
    return df


def write_raw_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).option("compression", "snappy")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_gz(
    df: DataFrame,
    path: str,
    *,
    sep: str = "|",
    header: bool = True,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .option("compression", "gzip")
        .option("header", str(header).lower())
        .option("quoteAll", "true")  # reference QUOTE_ALL, csv_formatter.py:26
        .csv(path, sep=sep)
    )


def parquet_column_bounds(path: str, column: str):
    """(min, max) of ``column`` from parquet FOOTER statistics — zero
    data scanned. The scale answer to a bounds probe over immutable
    files: footers are KB-sized regardless of data volume, so this is
    O(#files) metadata reads where a scan is O(rows). The reference
    issues ``SELECT MIN(id), MAX(id)`` against the source DB to plan
    chunked extracts (A1, ``sql_server_extractor.py``); over already
    -landed parquet the footer answers the same question for free.

    Returns ``None`` if any row group lacks min/max stats (caller falls
    back to a scan); values come back in parquet's physical terms (e.g.
    ``pd.Timestamp`` for timestamp columns, raw ints for int64).
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    if _os.path.isfile(path):
        files = [path]
    else:
        files = sorted(
            _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
        )
    if not files:
        return None
    lo = hi = None
    for f in files:
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        if column not in names:
            return None
        ci = names[column]
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)


def empty_frame(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """Schema-only DataFrame so downstream consumers see a stable schema."""
    return _rows_df(spark, [], schema)


def dedupe_column_names(df: DataFrame) -> DataFrame:
    """Rename duplicate column names to ``col``, ``col_1``, ``col_2``…
    (reference D2, ``sql_server_extractor.py:362-382`` /
    ``extract_data.py:430-463``): source queries with JOIN_EXPR or
    expression projections can return repeated names, which Parquet
    refuses to write."""
    seen: dict[str, int] = {}
    fixed: list[str] = []
    for name in df.columns:
        n = seen.get(name, 0)
        seen[name] = n + 1
        fixed.append(name if n == 0 else f"{name}_{n}")
    return df.toDF(*fixed) if fixed != df.columns else df


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_columns: list[str],
    num_buckets: int = 8,
    *,
    sort_columns: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Thin alias over :func:`operators.bucketing.write_bucketed` (the
    canonical bucketed-layout writer, which also supports external
    paths and pairs with the bucket-spec-checked ``bucketed_join``)."""
    from cdk_datalake_ingest_upeu_spark.operators.bucketing import write_bucketed

    write_bucketed(
        df,
        table_name,
        bucket_cols=bucket_columns,
        n_buckets=num_buckets,
        sort=sort_columns if sort_columns else True,
        mode=mode,
    )


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_columns: list[str],
    *,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-cluster the data layout on ``cluster_columns`` before
    writing: ``repartitionByRange`` + within-partition sort gives each
    output file a narrow, near-disjoint min/max envelope on the cluster
    key, so later filtered reads skip whole files/row-groups on footer
    statistics (the single-column analog of Z-ordering, with no table
    format required — plain parquet + stats).

    At 100 TB this is the data-layout lever that makes point/range
    lookups on a non-partition column cheap: partition directories
    handle the coarse key (date), range clustering handles the fine one
    (id, user, period). Verified by ``parquet_column_bounds`` per file
    in tests."""
    parts = (
        df.repartitionByRange(num_files, *cluster_columns)
        if num_files
        else df.repartitionByRange(*cluster_columns)
    )
    (
        parts.sortWithinPartitions(*cluster_columns)
        .write.mode(mode)
        .option("compression", "snappy")
        .parquet(path)
    )


def zorder_value(
    df: DataFrame, columns: list[str], *, bits_per_col: int | None = None
):
    """Z-order (Morton) key over ``columns`` as a Column expression.

    Each column is linearly binned into ``2^bits_per_col`` buckets
    between its min and max (one O(1) bounds probe per column), then
    the bucket bits are interleaved — pure shift/mask expressions,
    whole-stage codegen, no UDF. Linear binning favors roughly uniform
    keys; for heavily skewed keys, pre-transform (log, rank-bucket)
    before clustering.
    """
    from pyspark.sql import functions as F

    n = len(columns)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns; use range clustering for 1")
    if bits_per_col is None:
        bits_per_col = min(16, 62 // n)
    buckets = (1 << bits_per_col) - 1
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{i}") for i, c in enumerate(columns)],
        *[F.max(c).alias(f"hi_{i}") for i, c in enumerate(columns)],
    ).collect()[0]
    binned = []
    for i, c in enumerate(columns):
        raw_lo, raw_hi = bounds[f"lo_{i}"], bounds[f"hi_{i}"]
        if raw_lo is None or raw_hi is None:
            raise ValueError(
                f"zorder column {c!r} has no bounds (empty frame or "
                "all-NULL column) — nothing to cluster on"
            )
        try:
            lo, hi = float(raw_lo), float(raw_hi)
        except (TypeError, ValueError):
            raise ValueError(
                f"zorder column {c!r} is non-numeric "
                f"({type(raw_lo).__name__}); cast dates/timestamps to "
                "epoch numbers (or strings to a rank bucket) before "
                "clustering"
            ) from None
        span = (hi - lo) or 1.0
        b = F.least(
            F.lit(buckets),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * buckets),
        ).cast("long")
        binned.append(b)
    z = F.lit(0).cast("long")
    for bit in range(bits_per_col):
        for i, b in enumerate(binned):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * n + i
                )
            )
    return z


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_columns: list[str],
    *,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Multi-column Z-order layout: range-partition + sort on the
    interleaved Morton key so every output file covers a small
    HYPER-RECTANGLE of the cluster-column space — filtered reads on ANY
    clustered column (not just the first, which is all a lexicographic
    sort gives) skip most files on footer min/max stats. The
    plain-parquet analog of Delta/Iceberg OPTIMIZE ZORDER; at 100 TB
    this is how point lookups on two+ non-partition columns stay
    O(files-touched), not O(corpus)."""
    z = zorder_value(df, cluster_columns)
    parts = (
        df.withColumn("__z", z).repartitionByRange(num_files, "__z")
        if num_files
        else df.withColumn("__z", z).repartitionByRange("__z")
    )
    (
        parts.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .option("compression", "snappy")
        .parquet(path)
    )

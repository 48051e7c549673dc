"""Column-level table profiling — the ingest-side data-quality probe.

The reference samples each extracted table's bounds via scalar probes
(MIN/MAX watermark queries, COUNT gates — extract_data_spark.py's
bounds query and the DynamoDB run-log counts); a lake also needs the
per-column profile of what actually landed: null rates, cardinalities,
value ranges. Two plans, picked by ``exact``:

- ``exact=True``: one aggregate branch PER COLUMN, unioned. Exact
  distinct counts without the Catalyst ``Expand`` multiplier a single
  multi-``count_distinct`` aggregate would plan (Expand replicates
  every input row once per DISTINCT aggregate — ×n_cols row volume at
  100 TB). Each branch's scan reads exactly one column (columnar
  pruning), so total I/O ≈ one full-width scan and the branches run as
  independent stages of one job.
- ``exact=False``: ONE pass with ``approx_count_distinct`` (HLL) per
  column — no Expand, single scan, cardinalities within ``rsd``; the
  right default at 100 TB when exact distinct counts aren't worth a
  per-column pass.

Values are reported as strings so heterogeneous columns stack into one
result relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PROFILE_COLS = [
    "column_name",
    "n_rows",
    "n_nulls",
    "n_distinct",
    "min_value",
    "max_value",
]


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """One row per profiled column: name, row/null/distinct counts and
    min/max rendered as strings. See module docstring for the two
    physical plans."""
    cols = cols or df.columns
    if exact:
        parts = [
            df.select(F.col(c).alias("__v"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("__v").isNull().cast("long")).alias("n_nulls"),
                F.count_distinct("__v").alias("n_distinct"),
                F.min("__v").cast("string").alias("min_value"),
                F.max("__v").cast("string").alias("max_value"),
            )
            .select(F.lit(c).alias("column_name"), *_PROFILE_COLS[1:])
            for c in cols
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.approx_count_distinct(c, rsd).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"__rows_{c}").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(structs).alias("p")).select(
        *[F.col(f"p.{f}").alias(f) for f in _PROFILE_COLS]
    )


def profile_drift(old_profile: DataFrame, new_profile: DataFrame) -> DataFrame:
    """Per-column drift between two :func:`profile_table` outputs — the
    data-quality monitor a lake runs between landing generations (the
    reference's run-log severity checks only count transform failures;
    this catches silent upstream shifts: a column going nullable, a
    cardinality collapse, bounds walking).

    Inputs are KB-scale (one row per column) regardless of the
    underlying table size — the heavy scans already happened once per
    generation inside ``profile_table`` — so the join is trivially
    broadcast and the full-outer keeps columns that appeared or
    vanished visible."""
    o = old_profile.select(
        "column_name",
        F.col("n_rows").alias("n_rows_old"),
        F.col("n_nulls").alias("n_nulls_old"),
        F.col("n_distinct").alias("n_distinct_old"),
        F.col("min_value").alias("min_old"),
        F.col("max_value").alias("max_old"),
    )
    n = new_profile.select(
        "column_name",
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_nulls").alias("n_nulls_new"),
        F.col("n_distinct").alias("n_distinct_new"),
        F.col("min_value").alias("min_new"),
        F.col("max_value").alias("max_new"),
    )
    j = o.join(n, "column_name", "full_outer")
    return j.select(
        "column_name",
        "n_rows_old",
        "n_rows_new",
        F.round(F.col("n_nulls_old") / F.col("n_rows_old"), 6).alias("null_rate_old"),
        F.round(F.col("n_nulls_new") / F.col("n_rows_new"), 6).alias("null_rate_new"),
        "n_distinct_old",
        "n_distinct_new",
        (
            ~F.col("min_old").eqNullSafe(F.col("min_new"))
            | ~F.col("max_old").eqNullSafe(F.col("max_new"))
        ).alias("bounds_changed"),
    ).orderBy("column_name")


def dataset_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive content checksum of a row multiset: one row of
    (n_rows, checksum).

    Verifies two pipeline runs produced IDENTICAL data without sorting,
    shuffling, or moving anything: each row hashes to the first 48 bits
    of a portable md5 over its canonicalized columns, and the hashes SUM
    (decimal(38,0), overflow-safe past 1e12 rows x 48-bit values). Sum
    is commutative, so the checksum is independent of row order and
    partitioning, and the whole operator is a map-side partial aggregate
    — zero exchange of data rows at any scale.

    Canonicalization: columns cast to string, NULL replaced by a
    sentinel (concat_ws silently drops NULLs — ('a', NULL) must not
    collide with ('a',)), joined with an \\x1f separator. md5-over-text
    is the same portable-hash convention as the sampling oracles: any
    engine reproduces it. Caveat: float columns hash their TEXT — cast
    or round floats explicitly before checksumming across engines with
    different float formatting.
    """
    use_cols = cols or df.columns
    canon = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in use_cols
        ],
    )
    row_hash = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast(
        "decimal(38,0)"
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_hash).alias("checksum"),
    )

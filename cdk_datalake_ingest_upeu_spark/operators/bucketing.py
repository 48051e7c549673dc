"""Bucketed table layout — co-located joins without a shuffle.

The reference joins by pushing JOIN_EXPR to the source database (SURVEY
§2.3 J1); once the data lives in the lake, every repeated large-large
join pays a full shuffle of both sides unless the layout already agrees
with the join key. Bucketing is Spark's answer: write each side
hash-partitioned into the same number of buckets on the join key
(``DataFrameWriter.bucketBy`` + ``sortBy``), and every subsequent
equi-join or aggregation on that key reads co-located, pre-sorted
buckets — the plan shows SortMergeJoin with NO Exchange on either side.

At 100 TB this is the difference between re-shuffling a fact table for
every nightly join and shuffling it ONCE at landing time: bucket counts
are chosen per table size (buckets ~ table_bytes / 256 MB), and both
sides must agree on (key, bucket count) — enforced here.

Bucketed tables must go through the session catalog (plain
``.parquet(path)`` writes carry no bucket metadata), so writers take a
table name; ``external_path`` keeps the bytes in caller-owned storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: str | list[str],
    n_buckets: int,
    external_path: str | None = None,
    sort: bool | list[str] = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``sortBy`` matters as much as ``bucketBy``: sorted buckets let the
    join skip its per-task sort, so the whole join degenerates to a
    streaming merge of pre-sorted files. ``sort`` may be a column list
    to sort buckets by something other than the bucket key (e.g. bucket
    by id, sort by event time).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    w = df.write.mode(mode).bucketBy(n_buckets, *cols)
    if sort:
        w = w.sortBy(*(cols if sort is True else list(sort)))
    if external_path is not None:
        w = w.option("path", external_path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key.

    Plain ``spark.table(...).join(...)`` — Catalyst detects the
    matching bucket specs and plans the shuffle-free merge join; this
    wrapper exists to assert both sides were registered through
    :func:`write_bucketed` (a half-bucketed join silently re-shuffles
    the other side, which defeats the layout).
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    for t in (left_table, right_table):
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        }
        if "Num Buckets" not in desc:
            raise ValueError(f"table {t} is not bucketed — use write_bucketed")
    return spark.table(left_table).join(spark.table(right_table), on_cols, how)

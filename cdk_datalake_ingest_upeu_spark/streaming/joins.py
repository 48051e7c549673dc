"""Stream-stream interval join (Structured Streaming).

The reference has no streaming joins at all — its closest shape is the
batch JOIN_EXPR passthrough (``light_transform.py`` join handling,
SURVEY §2 J1). This is the Spark-native capability that subsumes it for
continuous pipelines: two event streams joined on a key with an
event-time interval condition.

Scale design: both sides carry a watermark and the join condition
carries explicit time bounds, so the state store keeps only the
``watermark + interval`` horizon per side — without the bounds a
stream-stream join buffers forever. The equality key is the shuffle
key; the interval predicate is evaluated inside the same join pass.
Inner joins emit eagerly (no watermark wait), so a fully drained
bounded stream equals the equivalent batch interval join row-for-row.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdk_datalake_ingest_upeu_spark.operators.joins import interval_join


def run_stream_interval_join(
    spark: SparkSession,
    source_dir: str,
    source_schema: T.StructType,
    out_dir: str,
    *,
    checkpoint_dir: str,
    left_type: str = "purchase",
    right_type: str = "click",
    key: str = "user_id",
    ts_col: str = "ts",
    lower: str = "-1 hours",
    upper: str = "0 seconds",
    watermark: str = "4 hours",
    max_files_per_trigger: int = 1,
    query_name: str = "stream_interval_join",
):
    """Join two event-type slices of one event stream: each ``left_type``
    row pairs with the ``right_type`` rows of the same key whose time
    falls in ``[left_ts + lower, left_ts + upper]``. Appends the joined
    rows to ``out_dir`` as parquet."""

    def side(tag: str, etype: str):
        s = (
            spark.readStream.schema(source_schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("latestFirst", "false")
            .parquet(source_dir)
        )
        return (
            s.filter(F.col("event_type") == etype)
            .select(
                F.col(key),
                F.col(ts_col).alias(f"{tag}_ts"),
                F.col("event_id").alias(f"{tag}_id"),
                F.col("value").alias(f"{tag}_value"),
            )
            .withWatermark(f"{tag}_ts", watermark)
        )

    joined = interval_join(
        side("l", left_type),
        side("r", right_type),
        key,
        "l_ts",
        "r_ts",
        lower=lower,
        upper=upper,
        how="inner",
    )
    return (
        joined.writeStream.queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )

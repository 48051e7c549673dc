"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no Structured Streaming (SURVEY §2.9) — its
"streaming" is watermark-driven batch micro-runs. This module is the
Spark-native upgrade the brief mandates: arbitrary per-key state carried
across micro-batches, with the same result as the batch operator when
the stream is fully drained.

Design for scale: state is per-key and tiny (three numbers per user for
sessionization); the grouping shuffle is the only data movement per
micro-batch, and the pandas function sees each key's batch slice as one
Arrow block. At 1000 executors this is the standard pattern for
continuous sessionization over event firehoses.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.functions.stable import fp_canon as _fp_c
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# (last event epoch-microseconds, sessions so far, events so far) —
# integer micros so the gap comparison is exact (no FP64 epoch rounding)
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_update(gap_seconds: float):
    """Build the per-key update function: fold this batch's events (in
    event-time order) into the carried (last_ts, n_sessions, n_events).

    The fold is vectorized: prepend the carried ``last_ts``, diff the
    epoch-microsecond array, and count gaps — no per-row Python loop
    (the whole batch slice is one numpy pass)."""
    gap_us = int(round(gap_seconds * 1_000_000))

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts_epoch", "event_id"])
            ts = pdf["ts_epoch"].to_numpy(dtype="int64")
            if last_ts is None:
                n_sessions += 1 + int((np.diff(ts) > gap_us).sum())
            else:
                full = np.concatenate(([last_ts], ts))
                n_sessions += int((np.diff(full) > gap_us).sum())
            last_ts = int(ts[-1])
            n_events += ts.size
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return update


def stateful_sessionization(
    events_stream: DataFrame,
    *,
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Running (n_sessions, n_events) per user over an event stream.

    Emits each key's CURRENT totals every micro-batch (update semantics);
    exactness across batches requires per-user event-time order across
    batch boundaries, which holds for time-ordered sources (file drops,
    kafka per-key ordering).
    """
    # cast-to-timestamp first so numeric epoch-second sources work too;
    # unix_micros keeps the gap math in exact integer microseconds
    prepared = events_stream.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_epoch"),
        F.col(event_id_col).alias("event_id"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_update(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_sessionization(
    spark: SparkSession,
    source_dir: str,
    source_schema: T.StructType,
    sink,
    *,
    checkpoint_dir: str,
    gap_seconds: float = 1800.0,
    max_files_per_trigger: int = 1,
    query_name: str = "stateful_sessionization",
):
    """Drive the stateful operator over a file-source stream; each
    micro-batch hands the emitted running totals to
    ``sink(batch_df, batch_id)`` (e.g. ``StageTable.merge`` on user_id,
    or an append tagged with the batch id for read-time latest-wins)."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(source_dir)
    )
    out = stateful_sessionization(stream, gap_seconds=gap_seconds)
    return (
        out.writeStream.queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda batch_df, batch_id: sink(batch_df, batch_id))
        .start()
    )


def run_streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    source_schema: T.StructType,
    out_dir: str,
    *,
    checkpoint_dir: str,
    key_cols: list[str] | tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 1,
    query_name: str = "streaming_dedup",
):
    """Streaming deduplication: emit the FIRST arrival of each key, drop
    re-deliveries (``dropDuplicatesWithinWatermark``) — the standard
    guard for at-least-once upstreams (Kafka redeliveries, retried file
    drops). Unlike plain ``dropDuplicates`` on a stream, per-key state is
    EVICTED once the watermark passes the key's first-seen event time, so
    state is bounded by the redelivery horizon instead of growing with
    the stream. Rows pass through immediately (dedup is a stateful
    filter, not an aggregation — no window finalization wait)."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(source_dir)
    )
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
    return (
        deduped.writeStream.queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )


def run_watermarked_rollup(
    spark: SparkSession,
    source_dir: str,
    source_schema: T.StructType,
    out_dir: str,
    *,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    window: str = "1 hour",
    max_files_per_trigger: int = 1,
    query_name: str = "watermarked_rollup",
):
    """Streaming tumbling-window rollup with an event-time watermark.

    ``withWatermark`` bounds the aggregation state: windows older than
    (max event time seen - watermark) are finalized, appended to the
    sink, and their state dropped — events later than that are DISCARDED
    (the late-data contract). For chronological sources the drained
    result equals the batch rollup; the trailing still-open windows are
    emitted on drain because ``processAllAvailable`` + append flushes
    finalized windows only, so callers run a final empty trigger or read
    the batch tail — here we simply rely on the caller draining with
    all data on time.

    State at scale: one row per (open window, event_type) — bounded by
    the watermark horizon, independent of stream length.
    """
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(source_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # per-value cents canon INSIDE the sum: exact, order-free,
            # NaN->NULL (functions/stable.py — the engine-boundary money
            # convention); the raw-double sum was summation-order noise
            F.round(F.sum(_fp_c(F.col("value"), 100)) / 100.0, 2).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )


def run_streaming_session_window(
    spark: SparkSession,
    source_dir: str,
    source_schema: T.StructType,
    out_dir: str,
    *,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key_col: str = "user_id",
    max_files_per_trigger: int = 1,
    query_name: str = "session_window_stream",
):
    """Streaming sessionization via the BUILT-IN ``session_window`` —
    the declarative twin of :func:`run_stateful_sessionization`: no
    Python state handler, Catalyst's session-merge aggregation carries
    the state. Sessions finalize (append to the sink, state dropped)
    once the watermark passes their end; gap-boundary semantics match
    the batch form (inclusive — pinned in tests).

    State at scale: one (key, open-session) row bounded by the
    watermark horizon — same shape as the hand-rolled processor, but
    JVM-side and mergeable across micro-batches for free.
    """
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(source_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(key_col, F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_fp_c(F.col("value"), 100)) / 100.0)
            .alias("sum_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import surface depends on pyspark version
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TRANSFORM_WITH_STATE = False


class TopKProcessor(StatefulProcessor):
    """Running per-key top-k (value, id) via ``transformWithStateInPandas``
    — the Spark 4 successor to ``applyInPandasWithState`` with TYPED state
    primitives (this uses a ValueState holding the top-k arrays; the same
    handle also offers ListState/MapState and timers).

    Per batch the key's slice is merged with the carried top-k and cut
    back to k — state is O(k) per key forever, and each batch emits the
    key's CURRENT top-k rollup (update semantics). Ties break on the
    lower id, so the fold is deterministic under any arrival order —
    the drained stream equals the batch window top-k exactly."""

    def __init__(self, k: int = 3):
        self.k = k

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.topk = handle.getValueState("topk", "vals array<double>, ids array<long>")

    def handleInputRows(self, key, rows, timer_values):
        if self.topk.exists():
            cur = self.topk.get()
            vals = np.asarray(cur[0], dtype="float64")
            ids = np.asarray(cur[1], dtype="int64")
        else:
            vals = np.empty(0, dtype="float64")
            ids = np.empty(0, dtype="int64")
        for pdf in rows:
            vals = np.concatenate([vals, pdf["value"].to_numpy(dtype="float64")])
            ids = np.concatenate([ids, pdf["event_id"].to_numpy(dtype="int64")])
        order = np.lexsort((ids, -vals))[: self.k]
        vals, ids = vals[order], ids[order]
        self.topk.update((vals.tolist(), ids.tolist()))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "topk_sum": [round(float(vals.sum()), 2)],
                "n_topk": [int(vals.size)],
            }
        )

    def close(self) -> None:
        pass


def run_streaming_topk(
    spark: SparkSession,
    source_dir: str,
    source_schema: T.StructType,
    sink,
    *,
    checkpoint_dir: str,
    k: int = 3,
    event_type: str = "purchase",
    max_files_per_trigger: int = 1,
    query_name: str = "streaming_topk",
):
    """Drive :class:`TopKProcessor` over a file-source stream; each
    micro-batch hands the per-key rollups to ``sink(batch_df, batch_id)``."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(source_dir)
    )
    out = (
        stream.filter(F.col("event_type") == event_type)
        .select("user_id", "value", "event_id")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TopKProcessor(k),
            outputStructType="user_id long, topk_sum double, n_topk int",
            outputMode="Update",
            timeMode="None",
        )
    )
    return (
        out.writeStream.queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda batch_df, batch_id: sink(batch_df, batch_id))
        .start()
    )


def _tws_runtime_available() -> bool:
    """``transformWithStateInPandas`` ships its own protobuf-based Python
    driver worker; without the ``protobuf`` package the worker crashes at
    init (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). This image has
    no protobuf (and no network to install it) — same class of runtime
    constraint as the missing Delta jars, handled the same way: the
    TWS path is written and gated, the applyInPandasWithState twin runs
    everywhere."""
    try:  # pragma: no cover - depends on image
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


TOPK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("topk_sum", T.DoubleType()),
        T.StructField("n_topk", T.IntegerType()),
    ]
)

_TOPK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
    ]
)


def _topk_update(k: int):
    """applyInPandasWithState twin of :class:`TopKProcessor` — identical
    merge-and-cut fold, portable state encoding (two arrays)."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            cur = state.get
            vals = np.asarray(cur[0], dtype="float64")
            ids = np.asarray(cur[1], dtype="int64")
        else:
            vals = np.empty(0, dtype="float64")
            ids = np.empty(0, dtype="int64")
        for pdf in pdfs:
            if not len(pdf):
                continue
            vals = np.concatenate([vals, pdf["value"].to_numpy(dtype="float64")])
            ids = np.concatenate([ids, pdf["event_id"].to_numpy(dtype="int64")])
        order = np.lexsort((ids, -vals))[:k]
        vals, ids = vals[order], ids[order]
        state.update((vals.tolist(), ids.tolist()))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "topk_sum": [round(float(vals.sum()), 2)],
                "n_topk": [int(vals.size)],
            }
        )

    return update


def run_streaming_topk_applyinpandas(
    spark: SparkSession,
    source_dir: str,
    source_schema: T.StructType,
    sink,
    *,
    checkpoint_dir: str,
    k: int = 3,
    event_type: str = "purchase",
    max_files_per_trigger: int = 1,
    query_name: str = "streaming_topk",
):
    """Portable driver for the running top-k: same fold as
    :func:`run_streaming_topk`, expressed with ``applyInPandasWithState``
    (runs on any pyspark ≥3.4 image; no protobuf requirement)."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(source_dir)
    )
    out = (
        stream.filter(F.col("event_type") == event_type)
        .select("user_id", "value", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _topk_update(k),
            outputStructType=TOPK_OUTPUT_SCHEMA,
            stateStructType=_TOPK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        out.writeStream.queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda batch_df, batch_id: sink(batch_df, batch_id))
        .start()
    )


# ---------------------------------------------------------------------------
# running volume z-score (streaming anomaly detection)
# ---------------------------------------------------------------------------

_ZSCORE_STATE_SCHEMA = "cnt long, s long, s2 long"
ZSCORE_OUTPUT_SCHEMA = "event_type string, day date, n_events long, z double"


def _zscore_update():
    """Per-type running (count, sum, sum-of-squares) over daily volumes;
    each arriving day is z-scored against the PRIOR days' exact integer
    sums before being folded in. Integer state means the derived
    mean/std doubles are bit-identical to the batch/oracle computation
    — no float accumulation order anywhere."""
    import math

    def update(key, pdf_iter, state):
        import pandas as pd

        cnt, s, s2 = state.get if state.exists else (0, 0, 0)
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values("day")
        out = []
        for day, n in zip(rows["day"], rows["n_events"]):
            n = int(n)
            z = None
            if cnt >= 2:
                mean = s / cnt
                var = s2 / cnt - mean * mean
                std = math.sqrt(max(var, 0.0))
                if std != 0.0:
                    z = (n - mean) / std
            out.append((key[0], day, n, z))
            cnt, s, s2 = cnt + 1, s + n, s2 + n * n
        state.update((cnt, s, s2))
        yield pd.DataFrame(out, columns=["event_type", "day", "n_events", "z"])

    return update


def run_running_zscore(
    spark: SparkSession,
    source_dir: str,
    source_schema: T.StructType,
    out_dir: str,
    *,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    query_name: str = "running_zscore",
):
    """Streaming anomaly detector over a daily-rollup feed: per
    event_type, three integers of state (count / sum / sum-of-squares
    of prior days); each day is scored as it arrives. The state is
    O(1) per key forever — the streaming twin of the batch
    ``events_anomaly_zscore`` window, with identical arithmetic."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(source_dir)
    )
    prepared = stream.select("event_type", "day", "n_events")
    out = prepared.groupBy("event_type").applyInPandasWithState(
        _zscore_update(),
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=_ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )

"""SparkSession factory tuned for the engine.

Mirrors the session flags the reference enables for its transform job
(AQE + skew join + coalesce partitions, Kryo — reference
``artifacts/aws-glue/code/stage/light_transform.py:2009-2024``) and adds
the flags needed for oracle-comparable, cast-tolerant semantics:

- ``spark.sql.ansi.enabled=false``: the reference's transform functions
  rely on "failed cast => NULL" (e.g. ``origin.cast(IntegerType())`` on
  junk strings) which is non-ANSI behaviour; Spark 4 defaults ANSI on.
- ``spark.sql.session.timeZone=UTC``: DuckDB timestamps are naive/UTC;
  pinning the session TZ makes timestamp comparisons stable.

At cluster scale the same builder applies; only ``master`` and the
shuffle-partition count change (set ``SPARK_GRAFT_CPUS`` or pass
``shuffle_partitions`` explicitly — rule of thumb: 2-3x total cores,
and ~128MB-256MB per shuffle partition at 100 TB, i.e. raise it to
hundreds of thousands for full-scale runs; AQE coalesces the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "cdk_datalake_ingest_upeu_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = DEFAULT_CPUS
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.localShuffleReader.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # split small parquet files across cores: with the 128MB/4MB
        # defaults a <=128MB table scans as ONE task, serializing every
        # narrow CPU-heavy pass downstream. minPartitionNum asks for at
        # least one split per core; openCostInBytes must drop too or the
        # 4MB floor re-merges the splits. No-ops at 100 TB (splits are
        # already plentiful and capped by maxPartitionBytes).
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.sql.files.openCostInBytes", "131072")
        # explicit-file-list scans (the versioned table passes every
        # live file as its own path) launch a DISTRIBUTED listing job
        # once the path count exceeds this threshold (default 32) —
        # for a ~100-file manifest that job costs more than statting
        # the paths on the driver ever could. Raise the cutoff so
        # driver-side listing (itself thread-pooled) covers manifest-
        # scale path lists; truly huge path lists still distribute.
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_LIST_THRESHOLD", "2048"),
        )
        # let the planner pick a shuffled HASH join where the build
        # side fits: same results as sort-merge minus both sorts.
        # Measured on the r14 join subset: q18 -23%, q5 -12%, subset
        # total -4%. Two independent gates open up: (a) the STATIC
        # planner's size-estimate rule (canBuildLocalHashMap — bounded
        # by autoBroadcastJoinThreshold x shuffle partitions, so its
        # memory exposure follows those knobs, NOT the env var below,
        # and estimates can be off after filters); (b) AQE's runtime
        # rewrite, which uses EXACT post-shuffle sizes and is bounded
        # by the env-tunable threshold below. Deployments that must
        # cap build memory strictly should ALSO lower
        # autoBroadcastJoinThreshold or re-enable preferSortMergeJoin.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "67108864"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )  # partition-level overwrite for incremental re-lands
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

from cdk_datalake_ingest_upeu_spark.streaming.incremental import (  # noqa: F401
    IncrementalRunner,
    stream_merge_ingest,
)

from cdk_datalake_ingest_upeu_spark.streaming.incremental import (  # noqa: F401
    IncrementalRunner,
    stream_merge_ingest,
)
from cdk_datalake_ingest_upeu_spark.streaming.joins import (  # noqa: F401
    run_stream_interval_join,
)
from cdk_datalake_ingest_upeu_spark.streaming.stateful import (  # noqa: F401
    TopKProcessor,
    run_stateful_sessionization,
    run_streaming_dedup,
    run_streaming_topk,
    run_streaming_topk_applyinpandas,
    run_watermarked_rollup,
)
from cdk_datalake_ingest_upeu_spark.streaming.bloom_dedup import (  # noqa: F401
    stream_bloom_dedup,
)

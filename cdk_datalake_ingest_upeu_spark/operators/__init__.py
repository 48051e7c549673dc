from cdk_datalake_ingest_upeu_spark.operators.stage_writer import (  # noqa: F401
    StageTable,
    dedup_latest,
    merge_upsert,
)

from cdk_datalake_ingest_upeu_spark.pipeline.driver import (  # noqa: F401
    PipelineDriver,
    RunLog,
    TableProcessor,
)

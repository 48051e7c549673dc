from cdk_datalake_ingest_upeu_spark.plans.strategy import (  # noqa: F401
    ExtractionPlan,
    LoadMode,
    determine_load_strategy,
)
from cdk_datalake_ingest_upeu_spark.plans.sqlgen import QueryGenerator  # noqa: F401
from cdk_datalake_ingest_upeu_spark.plans.watermark import WatermarkStore  # noqa: F401

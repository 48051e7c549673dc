from cdk_datalake_ingest_upeu_spark.functions.parser import ExpressionParser  # noqa: F401
from cdk_datalake_ingest_upeu_spark.functions.engine import (  # noqa: F401
    TransformationEngine,
    TransformError,
    TransformSeverityError,
)
from cdk_datalake_ingest_upeu_spark.functions.registry import (  # noqa: F401
    FUNCTION_REGISTRY,
    register_function,
    spark_type_for,
)
from cdk_datalake_ingest_upeu_spark.functions.dates import (  # noqa: F401
    MAGIC_OFFSET,
    PartitionPathFormatter,
    date_to_magic,
    delay_window_limits,
    magic_to_date,
)

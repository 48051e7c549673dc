from cdk_datalake_ingest_upeu_spark.config.models import (  # noqa: F401
    ColumnSpec,
    EndpointSpec,
    TableSpec,
)
from cdk_datalake_ingest_upeu_spark.config.loader import (  # noqa: F401
    load_config_csv,
    columns_for_table,
    endpoint_for,
    table_spec_for,
)

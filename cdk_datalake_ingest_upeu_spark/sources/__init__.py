from cdk_datalake_ingest_upeu_spark.sources.files import (  # noqa: F401
    read_raw_parquet,
    write_csv_gz,
    write_raw_parquet,
    empty_frame,
)
from cdk_datalake_ingest_upeu_spark.sources.jdbc import JdbcSource, ParquetTableSource  # noqa: F401

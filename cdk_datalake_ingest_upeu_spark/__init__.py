"""PySpark-native analytics/ingestion engine.

A from-scratch re-implementation of the query and data-processing
capabilities of the reference metadata-driven ELT system
(MR34Z1r0/cdk-datalake-ingest-upeu), re-expressed Spark-first:

- config-driven typed column transforms (``functions/``) compiled to a
  single Catalyst ``select`` — no Python UDFs in the hot path;
- load-strategy planning, pushdown SQL generation and watermark state
  (``plans/``);
- sources/sinks for parquet, csv.gz and JDBC (``sources/``);
- a managed stage table with MERGE-upsert, window dedup and
  compaction (``operators/stage_writer``);
- large-scale training-data operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding-cosine), ANN similarity
  search, text analysis, multimodal binary-column plumbing
  (``operators/``);
- incremental micro-batch + Structured Streaming ingestion
  (``streaming/``);
- an end-to-end pipeline driver replacing the reference's Step
  Functions orchestration (``pipeline/``).
"""

__version__ = "0.1.0"

from cdk_datalake_ingest_upeu_spark.session import get_spark  # noqa: F401
from cdk_datalake_ingest_upeu_spark.config import (  # noqa: F401,E402
    ColumnSpec,
    EndpointSpec,
    TableSpec,
    columns_for_table,
    endpoint_for,
    load_config_csv,
    table_spec_for,
)
from cdk_datalake_ingest_upeu_spark.operators.stage_writer import StageTable  # noqa: F401,E402
from cdk_datalake_ingest_upeu_spark.pipeline.driver import (  # noqa: F401,E402
    PipelineDriver,
    RunLog,
    TableProcessor,
)

"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship end-to-end stage pipeline at sf0.001.
- ``queries()``: one entry per implemented operator from SURVEY.md §2
  plus the training-data-pipeline operators (dedup / similarity / text /
  multimodal / streaming).
- ``oracle_sql()``: DuckDB-equivalent SQL for EVERY declared query
  (226/226 as of round 9). Approximate/iterative operators (MinHash,
  ANN, k-means, PCA, connected components, sketches, packing, BPE)
  are oracle-checked through their CONTRACTS: exact SQL-reproducible
  columns plus self-checking invariant booleans the oracle pins to
  TRUE (see the comment at the end of ``workloads.ORACLES``).

Implementation lives in ``cdk_datalake_ingest_upeu_spark.workloads``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdk_datalake_ingest_upeu_spark.workloads import (  # noqa: E402
    ORACLES,
    QUERIES,
    stage_pipeline_e2e,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return stage_pipeline_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

"""Table sources: JDBC (production) and parquet-backed (hermetic).

``JdbcSource`` replaces the reference's hand-rolled parallelism (X1
range buckets + X3 thread pools, ``extract_data_spark.py:578-602,701-734``)
with Spark's native partitioned JDBC scan: every bucket predicate from
the plan becomes one JDBC partition, i.e. one concurrent source query
per Spark task — the identical SQL, scheduled by Spark instead of a
thread pool.

``ParquetTableSource`` executes the SAME generated predicates against a
parquet replica via ``F.expr`` filters, keeping the whole planning
pipeline testable without a database and doubling as the engine's bulk
re-read path (predicates all push down to the parquet scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.config.models import EndpointSpec
from cdk_datalake_ingest_upeu_spark.plans.strategy import ExtractionPlan


class JdbcSource:
    """Reads extraction plans from a real RDBMS over JDBC."""

    def __init__(self, spark: SparkSession, endpoint: EndpointSpec, password: str = ""):
        self.spark = spark
        self.endpoint = endpoint
        self.password = password or endpoint.password

    def _base_options(self):
        return {
            "url": self.endpoint.jdbc_url(),
            "user": self.endpoint.username,
            "password": self.password,
            "driver": self.endpoint.jdbc_driver(),
        }

    def read_query(self, query: str, *, fetchsize: int = 10_000) -> DataFrame:
        """One pushed-down source query (reference S1,
        ``extract_data_spark.py:422-441``)."""
        return (
            self.spark.read.format("jdbc")
            .options(**self._base_options())
            .option("query", query)
            .option("fetchsize", str(fetchsize))
            .load()
        )

    def read_plan(self, plan: ExtractionPlan, table_expr: str, projection: str) -> DataFrame:
        """Execute an ExtractionPlan.

        - partitioned_full: one ``dbtable`` read with
          ``partitionColumn/lowerBound/upperBound/numPartitions`` — Spark
          generates the same contiguous bucket predicates the reference
          builds by hand.
        - between_date / standard: union of per-query reads (each is one
          pushed query; Spark schedules them concurrently).
        """
        if plan.kind == "partitioned_full" and plan.min_val is not None:
            return (
                self.spark.read.format("jdbc")
                .options(**self._base_options())
                .option("dbtable", f"(select {projection} from {table_expr}) src")
                .option("partitionColumn", plan.partition_column)
                .option("lowerBound", str(plan.min_val))
                .option("upperBound", str(plan.max_val + 1))
                .option("numPartitions", str(plan.num_splits))
                .load()
            )
        frames = [self.read_query(q) for q in plan.queries]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out


class ParquetTableSource:
    """Runs generated SQL predicates against a parquet-backed table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def scan(self) -> DataFrame:
        from cdk_datalake_ingest_upeu_spark.sources.files import (
            normalize_timestamp_shapes,
        )

        # the ingest boundary owns physical-shape normalization (nanos/
        # NTZ/adjusted timestamp variants), exactly like the reference's
        # per-dialect type handling — generated predicates then compare
        # against real TIMESTAMP columns whatever the replica wrote
        df = self.spark.read.parquet(self.path)
        return normalize_timestamp_shapes(self.spark, df, self.path)

    def read_predicates(self, predicates: list[str]) -> DataFrame:
        """Union of bucket scans — used to verify bucket-union == full-scan
        (the X1 invariant) and to run plans hermetically. Each predicate
        is pushed down to the parquet reader."""
        frames = [self.scan().filter(F.expr(p)) for p in predicates]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def min_max(self, column: str, *, exclude_zero: bool = True) -> tuple:
        """A1 bounds probe (``extract_data_spark.py:551-576``)."""
        df = self.scan()
        if exclude_zero:
            df = df.filter(F.col(column) != 0)
        row = df.agg(
            F.min(column).alias("min_val"), F.max(column).alias("max_val")
        ).first()
        return row["min_val"], row["max_val"]

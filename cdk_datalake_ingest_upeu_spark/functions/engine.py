"""Transformation engine: config -> ONE Catalyst ``select``.

Compiles every column's transform expression into a named ``Column`` and
applies them in a single ``df.select(*exprs)`` — the same
one-projection strategy as the reference (``light_transform.py:702-737``)
so Catalyst sees one narrow projection it can push through and codegen.

Error semantics preserved (``light_transform.py:1471-1509``): a column
whose expression fails to BUILD becomes ``lit(None).cast(declared_type)``
and is tallied; >50% failed columns raises, 10-50% is a returned
warning, <10% is informational.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.config.models import ColumnSpec
from cdk_datalake_ingest_upeu_spark.functions.parser import ExpressionParser
from cdk_datalake_ingest_upeu_spark.functions.registry import (
    FUNCTION_RETURN_TYPES,
    apply_function,
    spark_type_for,
)


class TransformError(Exception):
    pass


class TransformSeverityError(TransformError):
    """>50% of columns failed to compile (``light_transform.py:1487-1494``)."""

    def __init__(self, errors: list[str]):
        self.errors = errors
        super().__init__(f"{len(errors)} transform columns failed: {errors[:3]}")


@dataclass
class TransformResult:
    df: DataFrame
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)


class TransformationEngine:
    def __init__(self):
        self.parser = ExpressionParser()

    # -- expression compilation -------------------------------------------

    def compile_column(self, spec: ColumnSpec, df_columns: list[str]) -> Column:
        """One ColumnSpec -> aliased Column expression."""
        parsed = self.parser.parse(spec.transformation)
        if parsed is None:
            return F.lit(None).cast(spark_type_for(spec.data_type)).alias(spec.name)
        if parsed.kind == "column":
            return F.col(parsed.name).alias(spec.name)
        expr = self._compile_call(parsed.name, parsed.params, spec.data_type, df_columns)
        return expr.alias(spec.name)

    def _compile_call(
        self, fn_name: str, raw_params: list[str], data_type: str, df_columns: list[str]
    ) -> Column:
        resolved: list = []
        for token in raw_params:
            token = token.strip()
            if token.startswith("fn_transform_"):
                nested = self.parser.parse(token)
                if nested is not None and nested.kind == "call":
                    nested_type = FUNCTION_RETURN_TYPES.get(nested.name, "string")
                    resolved.append(
                        self._compile_call(nested.name, nested.params, nested_type, df_columns)
                    )
                    continue
                resolved.append(F.lit(token))
            elif token in df_columns:
                resolved.append(F.col(token))
            else:
                resolved.append(token)  # literal/format/rule string
        return apply_function(fn_name, resolved, data_type)

    # -- whole-table application -------------------------------------------

    def apply(self, df: DataFrame, columns: list[ColumnSpec]) -> TransformResult:
        """Compile all columns and apply as a single select."""
        errors: list[str] = []
        exprs: list[Column] = []
        df_columns = df.columns
        for spec in sorted(columns, key=lambda c: c.column_id):
            try:
                exprs.append(self.compile_column(spec, df_columns))
            except Exception as exc:  # failed column -> typed NULL + tally
                errors.append(f"column {spec.name}: {exc}")
                exprs.append(
                    F.lit(None).cast(spark_type_for(spec.data_type)).alias(spec.name)
                )
        out = df.select(*exprs) if exprs else df

        warnings: list[str] = []
        if errors:
            pct = 100.0 * len(errors) / max(1, len(columns))
            if pct > 50:
                raise TransformSeverityError(errors)
            warnings = errors
        return TransformResult(df=out, errors=errors, warnings=warnings)

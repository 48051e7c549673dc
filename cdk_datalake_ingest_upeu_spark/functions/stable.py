"""Engine-stable fixed-point canonicalization of doubles.

Double TEXT is not portable across engines (Java science-notation /
"NaN" vs DuckDB positional / "nan"), double->DECIMAL casts flip at
half-ulp boundaries (string-mediated BigDecimal in Spark vs binary
scaling in DuckDB — DuckDB also hard-errors on NaN), and double SUMS
carry summation-order noise no post-hoc rounding can remove. The one
portable primitive is fixed-point through pure IEEE-754 ops:

    canon(x) = floor(x * scale + 0.5)   as BIGINT

— multiply, add, floor are each single correctly-rounded IEEE ops with
bit-identical results in every engine. Summing the resulting integers
is exact and associative; dividing the integer sum back by the scale is
again one IEEE op. Totality guards (perturbation-sweep hardened):

- NaN -> NULL (DuckDB refuses NaN->BIGINT; Spark non-ANSI yields NULL —
  pin both engines to NULL, which aggregation then skips).
- |scaled| saturates at 1e14 (±Inf included): past the double mantissa
  there is no fixed-point information and double->int conversion stops
  being engine-portable; the clamp comparison itself is IEEE-portable.
  The bound also guarantees a 60k-row hostile sum stays below 2^63, so
  Spark's BIGINT sum cannot wrap where DuckDB's int128 would not.

Use :func:`fp_canon` inside DataFrame aggregates and :func:`fp_sql`
inside oracle SQL (the emitted text is valid Spark SQL *and* DuckDB
SQL); divide the summed result by the scale to return to value units.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SATURATE = 1.0e14


def fp_canon(col: Column | str, scale: int = 100) -> Column:
    """Per-value fixed-point canon: floor(col*scale + 0.5) as bigint,
    NaN->NULL, saturating at ±1e14 scaled units."""
    col = F.col(col) if isinstance(col, str) else col
    y = col * scale + F.lit(0.5)
    return (
        F.when(F.isnan(col), F.lit(None).cast("bigint"))
        .when(y >= SATURATE, F.lit(100000000000000))
        .when(y <= -SATURATE, F.lit(-100000000000000))
        .otherwise(F.floor(y).cast("bigint"))
    )


def fp_sql(expr: str, scale: int = 100) -> str:
    """SQL twin of :func:`fp_canon` — portable Spark SQL == DuckDB SQL."""
    y = f"({expr}) * {scale} + 0.5"
    return (
        f"CASE WHEN isnan({expr}) THEN NULL "
        f"WHEN {y} >= 100000000000000.0 THEN 100000000000000 "
        f"WHEN {y} <= -100000000000000.0 THEN -100000000000000 "
        f"ELSE CAST(floor({y}) AS BIGINT) END"
    )

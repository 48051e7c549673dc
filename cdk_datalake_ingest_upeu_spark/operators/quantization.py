"""Embedding quantization — int8 storage for 100 TB vector columns.

A float32 embedding column is 4 bytes/dim; at corpus scale the
embedding table often outweighs the text. Symmetric per-vector int8
quantization (scale = max|v| / 127, q = round(v / scale)) cuts that 4x
with bounded reconstruction error, and the error profile decides
whether ANN/near-dup runs on the quantized vectors directly.

This operator computes the quantization round-trip error per vector in
ONE Arrow batch pass (numpy, no per-element expressions — the same
lesson as :func:`operators.dedup.cosine`): scale, RMSE, and max
absolute error. Rounding is explicit ``floor(x + 0.5)`` so the DuckDB
oracle can reproduce it bit-for-bit (numpy's ``rint`` rounds
half-to-even, SQL ``round`` half-away — both diverge at .5
boundaries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quant_err_batch(v: pd.Series) -> pd.DataFrame:
    if len(v) == 0:
        return pd.DataFrame({"scale": [], "rmse": [], "max_err": []})
    M = np.stack(v.to_numpy()).astype(np.float64)
    scale = np.abs(M).max(axis=1) / 127.0
    safe = np.where(scale == 0.0, 1.0, scale)[:, None]
    q = np.floor(M / safe + 0.5)
    err = np.abs(M - q * safe)
    err[scale == 0.0] = 0.0  # all-zero vector quantizes exactly
    return pd.DataFrame(
        {
            "scale": scale,
            "rmse": np.sqrt((err * err).sum(axis=1) / M.shape[1]),
            "max_err": err.max(axis=1),
        }
    )


def quantization_error(vec_col: Column) -> Column:
    """struct(scale, rmse, max_err) for symmetric int8 quantization of
    ``vec_col`` — one vectorized pass per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf("scale double, rmse double, max_err double")(
        _quant_err_batch
    )(vec_col)


def _quantize_batch(v: pd.Series) -> pd.DataFrame:
    if len(v) == 0:
        return pd.DataFrame({"scale": [], "codes": []})
    M = np.stack(v.to_numpy()).astype(np.float64)
    scale = np.abs(M).max(axis=1) / 127.0
    safe = np.where(scale == 0.0, 1.0, scale)[:, None]
    codes = np.floor(M / safe + 0.5).astype(np.int8)
    codes[scale == 0.0] = 0
    return pd.DataFrame({"scale": scale, "codes": list(codes)})


def quantize_vec(vec_col: Column) -> Column:
    """``struct(scale double, codes array<tinyint>)`` — the stored int8
    representation (4x smaller than float32; at 100 TB the embedding
    table drops to ~25 TB plus one double per vector). One vectorized
    numpy pass per Arrow batch; ``floor(x + 0.5)`` rounding so the
    DuckDB oracle reproduces the codes bit-for-bit."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf("scale double, codes array<tinyint>")(_quantize_batch)(
        vec_col
    )


def dequantize(quant_col: Column) -> Column:
    """Reconstruct ``array<double>`` from a :func:`quantize_vec` struct —
    pure ``transform`` expression (whole-stage codegen, no UDF): the
    scan-side decode path ANN/near-dup run on directly."""
    return F.transform(
        quant_col["codes"],
        lambda c: c.cast("double") * quant_col["scale"],
    )


def quantization_report(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str | None = None,
) -> DataFrame:
    """Per-group (or global) quantization error report: vector count,
    mean scale, mean RMSE, worst absolute error. Scan-side UDF + one
    tiny aggregation — no shuffle of the vectors themselves."""
    q = df.withColumn("__q", quantization_error(F.col(vec_col)))
    keys = [group_col] if group_col else []

    # Order-independent means: per-row round to 6 places (absorbs the
    # ~1e-16 numpy-pairwise vs sequential list_sum drift in rmse), then
    # an exact decimal sum so partition order can't flip the text that
    # the correctness gate hashes.  DuckDB twin:
    #   CAST(sum(CAST(round(x, 6) AS DECIMAL(18,9))) AS DOUBLE) / count(*)
    def _mean6(col: Column) -> Column:
        return F.sum(F.round(col, 6).cast("decimal(18,9)")).cast(
            "double"
        ) / F.count(F.lit(1))

    agg = q.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        _mean6(F.col("__q.scale")).alias("avg_scale"),
        _mean6(F.col("__q.rmse")).alias("avg_rmse"),
        F.round(F.max("__q.max_err"), 6).alias("worst_abs_err"),
    )
    return agg.orderBy(*keys) if keys else agg

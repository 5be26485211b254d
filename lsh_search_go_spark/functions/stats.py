"""Dataset statistics + standard scaler (reference A1-A4).

* ``dim_stats`` — per-dimension mean and *mean absolute deviation*: the
  reference's ``GetMeanStdSampled`` labels MAD as "std"
  (/root/reference/lsh/helpers.go:44-80: ``std[j] += |x - mean|; /n``) — a
  quirk we expose honestly as ``mad`` while also emitting the real stddev.
  The reference samples with replacement driver-side; distributed we compute
  exactly over the corpus (or over ``df.sample``, caller's choice) — the
  sampling existed only because the Go version was memory-bound.
* ``scale_vectors`` — the standard scaler ``(x - mean) / std`` with the
  reference's nil/mismatch fallback of mean=0, std=1
  (/root/reference/lsh/helpers.go:151-191).
* ``vector_range`` — global min/max over all vector components
  (/root/reference/annbench/annbench.go:127-141, minus its accidental
  O(n·m log m) per-row sort).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dim_stats(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    """(dim, mean, mad, stddev) — one row per vector dimension.

    posexplode + groupBy(dim): two shuffles on a tiny key domain; map-side
    partial aggregation keeps the wide scan single-pass."""
    exploded = df.select(F.posexplode(vec_col).alias("dim", "x")) \
        .withColumn("x", F.col("x").cast("double"))
    means = exploded.groupBy("dim").agg(
        F.avg("x").alias("mean"),
        F.stddev_pop("x").alias("stddev"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        exploded.join(F.broadcast(means), "dim")
        .groupBy("dim")
        .agg(
            F.first("mean").alias("mean"),
            F.avg(F.abs(F.col("x") - F.col("mean"))).alias("mad"),
            F.first("stddev").alias("stddev"),
        )
        .orderBy("dim")
    )


def vector_range(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    """One row: (vmin, vmax) over every component."""
    return df.select(
        F.min(F.array_min(F.col(vec_col).cast("array<double>"))).alias("vmin"),
        F.max(F.array_max(F.col(vec_col).cast("array<double>"))).alias("vmax"),
    )


def scale_vectors(df: DataFrame, mean: np.ndarray | None, std: np.ndarray | None,
                  n_dims: int, vec_col: str = "vec",
                  out_col: str = "scaled") -> DataFrame:
    """(x - mean) / std element-wise via one Arrow-batched UDF.

    Reference fallback semantics (/root/reference/lsh/helpers.go:158-171):
    nil or size-mismatched mean/std → mean=0, std=1; zero std entries → 1
    (avoid div-by-zero, same effective behavior)."""
    if mean is None or len(mean) != n_dims:
        mean = np.zeros(n_dims)
    if std is None or len(std) != n_dims:
        std = np.ones(n_dims)
    mean = np.asarray(mean, dtype=np.float64)
    std = np.where(np.asarray(std, dtype=np.float64) == 0.0, 1.0, std)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(((X - mean) / std).tolist())

    return df.withColumn(out_col, udf(F.col(vec_col)))

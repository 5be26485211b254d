"""Fused signature computation: ONE Arrow UDF for the pipeline hot path.

Chaining separate pandas UDFs (shingles → minhash → simhash) looks modular
but Spark nests the upstream UDF into each downstream one —
``ArrowEvalPython [udf(content), udf(udf(content)), udf(udf(content))]`` —
re-running shingling once per consumer (measured 3× the work and 3× the
Arrow traffic).  The pipeline therefore computes text →
(shingles, minhash, bands, simhash) in a single fused UDF; the composable
per-step functions in shingles.py / hashing.py / simhash.py remain the
oracle-gated and unit-tested definitions this fused kernel must match
(tests/test_signatures.py::test_fused_matches_composed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lsh_search_go_spark.config import DedupConfig
from lsh_search_go_spark.functions import hashing as H
from lsh_search_go_spark.functions.shingles import _shingle_batch
from lsh_search_go_spark.functions.simhash import simhash_batch

SIG_STRUCT = T.StructType([
    T.StructField("shingles", T.ArrayType(T.LongType())),
    T.StructField("minhash", T.ArrayType(T.LongType())),
    T.StructField("bands", T.ArrayType(T.LongType())),
    T.StructField("simhash", T.ArrayType(T.LongType())),
])


def with_signatures_fused(df: DataFrame, cfg: DedupConfig,
                          content_col: str | None = None) -> DataFrame:
    """Adds shingles/minhash/bands/simhash in one Arrow pass over content."""
    content_col = content_col or cfg.content_col
    a, b = cfg.minhash_params
    an = np.asarray(a, dtype=np.int64)
    bn = np.asarray(b, dtype=np.int64)
    num_bands, rows_per_band = cfg.num_bands, cfg.rows_per_band

    @F.pandas_udf(SIG_STRUCT)
    def udf(texts: pd.Series) -> pd.DataFrame:
        sh = _shingle_batch(texts, cfg)
        sh_lists = sh.tolist()
        sigs = H.minhash_batch_np(sh_lists, an, bn)
        bands = H.banded_batch_np(sigs, num_bands, rows_per_band)
        simw = simhash_batch(sh, cfg)
        return pd.DataFrame({
            "shingles": sh_lists,
            "minhash": list(sigs.tolist()),
            "bands": list(bands.tolist()),
            "simhash": list(simw),
        })

    tmp = df.withColumn("__sig", udf(F.col(content_col)))
    return (
        tmp.withColumn("shingles", F.col("__sig.shingles"))
        .withColumn("minhash", F.col("__sig.minhash"))
        .withColumn("bands", F.col("__sig.bands"))
        .withColumn("simhash", F.col("__sig.simhash"))
        .drop("__sig")
    )

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
from lsh_search_go_spark.functions.simhash import simhash_batch

SIG_STRUCT = T.StructType([
    T.StructField("shingles", T.ArrayType(T.LongType())),
    T.StructField("minhash", T.ArrayType(T.LongType())),
    T.StructField("bands", T.ArrayType(T.LongType())),
    T.StructField("simhash", T.ArrayType(T.LongType())),
    T.StructField("norm_text", T.StringType()),
    T.StructField("first_sh", T.LongType()),
    T.StructField("last_sh", T.LongType()),
])


def _tokenize_batch(texts: pd.Series, cfg: DedupConfig):
    """Shared normalization+tokenization (identical to shingles._shingle_batch
    and the SQL tokens_expr): returns (tok_lists, counts, flat_hashes, starts)."""
    s = texts.fillna("")
    if cfg.strip_comments:
        s = s.str.replace(r"#[^\n]*", " ", regex=True)
    if cfg.lowercase:
        s = s.str.lower()
    stripped = s.str.strip()
    tok_lists = stripped.str.split(r"\s+")
    empty = stripped == ""
    if empty.any():
        tok_lists = tok_lists.where(~empty, other=pd.Series([[]] * int(empty.sum()),
                                                            index=tok_lists.index[empty]))
    counts = tok_lists.str.len().to_numpy(dtype=np.int64)
    flat = pd.Series([t for xs in tok_lists for t in xs], dtype=object)
    flat_hashes = H.poly31_np(flat)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return tok_lists, counts, flat_hashes, starts


def with_signatures_fused(df: DataFrame, cfg: DedupConfig,
                          content_col: str | None = None) -> DataFrame:
    """Adds shingles/minhash/bands/simhash + the substring-pass inputs
    (norm_text, first/last shingle keys) in one Arrow pass over content."""
    content_col = content_col or cfg.content_col
    a, b = cfg.minhash_params
    an = np.asarray(a, dtype=np.int64)
    bn = np.asarray(b, dtype=np.int64)
    num_bands, rows_per_band = cfg.num_bands, cfg.rows_per_band
    k = cfg.shingle_k

    @F.pandas_udf(SIG_STRUCT)
    def udf(texts: pd.Series) -> pd.DataFrame:
        tok_lists, counts, flat_hashes, starts = _tokenize_batch(texts, cfg)
        n = len(counts)
        sh_lists: list[list[int]] = []
        first_sh = np.full(n, -1, dtype=np.int64)
        last_sh = np.full(n, -1, dtype=np.int64)
        for i in range(n):
            c = counts[i]
            doc_h = flat_hashes[starts[i]:starts[i] + c]
            win = H.windowed_combine_np(doc_h, k)
            sh_lists.append(np.unique(win).tolist())
            if win.size:
                first_sh[i] = win[0]
                last_sh[i] = win[-1]
        sigs = H.minhash_batch_np(sh_lists, an, bn)
        bands = H.banded_batch_np(sigs, num_bands, rows_per_band)
        simw = simhash_batch(pd.Series(sh_lists), cfg)
        return pd.DataFrame({
            "shingles": sh_lists,
            "minhash": list(sigs.tolist()),
            "bands": list(bands.tolist()),
            "simhash": list(simw),
            "norm_text": [" ".join(xs) for xs in tok_lists],
            "first_sh": first_sh,
            "last_sh": last_sh,
        })

    tmp = df.withColumn("__sig", udf(F.col(content_col)))
    out = tmp
    for c in ("shingles", "minhash", "bands", "simhash",
              "norm_text", "first_sh", "last_sh"):
        out = out.withColumn(c, F.col(f"__sig.{c}"))
    return out.drop("__sig")

"""Shingling: normalized text/code → array of k-shingle hashes.

This is the pipeline's "feature extraction" — the analog of the reference
consuming pre-made dense vectors (/root/reference/lsh/lsh.go:57); for a code
corpus the features must be *derived* from ``content``.

Two interchangeable backends (tested bit-identical):

* ``impl="sql"``    — Spark higher-order functions; JVM, whole-stage codegen.
* ``impl="pandas"`` — Arrow-batched pandas UDF, numpy position-loop hashing
  (the spec's "vectorized pandas/Arrow UDFs, no per-row Python" path).

Normalization is deliberately simple and *identical* across backends and the
DuckDB oracle: optional lowercase → trim → split on ``\\s+`` → drop empties.
Code-aware normalization (comment stripping) is a pre-step in synth/pipeline,
not baked in here.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lsh_search_go_spark.config import DedupConfig
from lsh_search_go_spark.functions import hashing as H


# ---------------------------------------------------------------------------
# Spark-SQL backend
# ---------------------------------------------------------------------------

def tokens_expr(content_col: str, lowercase: bool = True,
                strip_comments: bool = False) -> str:
    src = content_col
    if strip_comments:
        src = f"regexp_replace({src}, '#[^\\\\n]*', ' ')"
    if lowercase:
        src = f"lower({src})"
    return f"filter(split(trim({src}), '\\\\s+'), t -> t != '')"


def shingle_hashes_sql(content_col: str, cfg: DedupConfig) -> Column:
    """content → array<bigint> of DISTINCT, SORTED k-shingle hashes.

    Sorted so that downstream set ops and the oracle compare canonically.
    """
    toks = tokens_expr(content_col, cfg.lowercase, cfg.strip_comments)
    inner = H.combine_hash_expr(f"slice(__th, i, {cfg.shingle_k})")
    expr = (
        f"case when size(__th) >= {cfg.shingle_k} then "
        f"array_sort(array_distinct(transform(sequence(1, size(__th) - {cfg.shingle_k} + 1), "
        f"i -> {inner}))) else array() end"
    )
    # substitute the token-hash expression for __th
    th_sql = f"transform({toks}, t -> {H.poly31_char_hash_expr('t')})"
    return F.expr(expr.replace("__th", th_sql)).cast("array<bigint>")


def with_shingles_sql(df: DataFrame, cfg: DedupConfig, out_col: str = "shingles") -> DataFrame:
    return df.withColumn(out_col, shingle_hashes_sql(cfg.content_col, cfg))


# ---------------------------------------------------------------------------
# pandas/Arrow backend
# ---------------------------------------------------------------------------

def _shingle_batch(texts: pd.Series, cfg: DedupConfig) -> pd.Series:
    """One Arrow batch: Series[str] → Series[list[int]] of distinct sorted
    shingle hashes.  Tokenization is pandas C-vectorized; hashing is the
    position-loop numpy poly31; windowing is stride tricks.

    Per-document boundaries are respected by hashing ALL tokens of the batch
    in one flat array, then slicing windows per document.
    """
    s = texts.fillna("")
    if cfg.strip_comments:
        s = s.str.replace(r"#[^\n]*", " ", regex=True)
    if cfg.lowercase:
        s = s.str.lower()
    # Java/RE2 \s class explicitly — Python's \s also matches \x1c-\x1f and
    # Unicode spaces, which would diverge from the SQL/DuckDB backends
    ws = " \t\n\x0b\f\r"
    stripped = s.str.strip(ws)
    tok_lists = stripped.str.split(f"[{ws}]+")
    # after strip, split(\s+) yields [''] only for the empty string
    empty = stripped == ""
    if empty.any():
        tok_lists = tok_lists.where(~empty, other=pd.Series([[]] * int(empty.sum()),
                                                            index=tok_lists.index[empty]))
    counts = tok_lists.str.len().to_numpy(dtype=np.int64)
    flat = pd.Series([t for xs in tok_lists for t in xs], dtype=object)
    flat_hashes = H.poly31_np(flat)
    out: list[list[int]] = []
    pos = 0
    k = cfg.shingle_k
    for c in counts:
        doc_h = flat_hashes[pos:pos + c]
        pos += c
        sh = H.windowed_combine_np(doc_h, k)
        out.append(np.unique(sh).tolist())
    return pd.Series(out)


def with_shingles_pandas(df: DataFrame, cfg: DedupConfig, out_col: str = "shingles") -> DataFrame:
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(texts: pd.Series) -> pd.Series:
        return _shingle_batch(texts, cfg)

    return df.withColumn(out_col, udf(F.col(cfg.content_col)))


def with_shingles(df: DataFrame, cfg: DedupConfig, impl: str = "sql",
                  out_col: str = "shingles") -> DataFrame:
    if impl == "sql":
        return with_shingles_sql(df, cfg, out_col)
    if impl == "pandas":
        return with_shingles_pandas(df, cfg, out_col)
    raise ValueError(f"unknown impl {impl!r}")


# ---------------------------------------------------------------------------
# DuckDB oracle mirror
# ---------------------------------------------------------------------------

def duck_tokens(content_sql: str, lowercase: bool = True,
                strip_comments: bool = False) -> str:
    src = content_sql
    if strip_comments:
        src = f"regexp_replace({src}, '#[^\\n]*', ' ', 'g')"
    if lowercase:
        src = f"lower({src})"
    return (
        f"list_filter(string_split_regex(trim({src}), '\\s+'), t -> t != '')"
    )


def duck_shingle_hashes(content_sql: str, cfg: DedupConfig) -> str:
    toks = duck_tokens(content_sql, cfg.lowercase, cfg.strip_comments)
    th = f"list_transform({toks}, t -> {H.duck_poly31('t')})"
    k = cfg.shingle_k
    inner = H.duck_combine(f"list_slice(__th, i + 1, i + {k})")
    expr = (
        f"case when len(__th) >= {k} then "
        f"list_sort(list_distinct(list_transform(range(len(__th) - {k} + 1), i -> {inner}))) "
        f"else [] end"
    )
    return expr.replace("__th", th)

"""Text-analysis operators for a training-data pipeline: quality scoring,
token counting, document fingerprinting.

All JVM-side column expressions (no UDFs): these run on every document of a
100 TB corpus, so they must stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsh_search_go_spark.config import DedupConfig
from lsh_search_go_spark.functions import hashing as H
from lsh_search_go_spark.functions.shingles import tokens_expr, duck_tokens

# Tiny fixed stopword list — deterministic, engine-agnostic.
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")


def doc_profile(df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Per-document profile: token counts, distinct ratio, stopword ratio,
    mean token length, and a rolling-hash fingerprint of the normalized
    token stream (order-sensitive poly combine of token hashes — two docs
    share a fingerprint iff their normalized token streams are identical)."""
    toks = tokens_expr(cfg.content_col, cfg.lowercase, cfg.strip_comments)
    th = f"transform({toks}, t -> {H.poly31_char_hash_expr('t')})"
    sw = "array(" + ",".join(f"'{w}'" for w in STOPWORDS) + ")"
    return df.select(
        F.col(cfg.id_col),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").alias("n_distinct_tokens"),
        F.expr(f"size(filter({toks}, t -> array_contains({sw}, t)))").alias("n_stopwords"),
        F.expr(f"aggregate({toks}, 0, (s, t) -> s + length(t))").alias("n_token_chars"),
        F.expr(H.combine_hash_expr(th)).alias("fingerprint"),
    )


def token_frequencies(df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Global token frequency table (token, n_docs, n_occurrences)."""
    toks = tokens_expr(cfg.content_col, cfg.lowercase, cfg.strip_comments)
    exploded = df.select(
        F.col(cfg.id_col),
        F.explode(F.expr(toks)).alias("token"),
    )
    return exploded.groupBy("token").agg(
        F.countDistinct(cfg.id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


# --- DuckDB mirrors ---------------------------------------------------------

def duck_doc_profile_exprs(content_sql: str, cfg: DedupConfig) -> dict[str, str]:
    toks = duck_tokens(content_sql, cfg.lowercase, cfg.strip_comments)
    th = f"list_transform({toks}, t -> {H.duck_poly31('t')})"
    sw = "[" + ",".join(f"'{w}'" for w in STOPWORDS) + "]"
    return {
        "n_tokens": f"len({toks})",
        "n_distinct_tokens": f"len(list_distinct({toks}))",
        "n_stopwords": f"len(list_filter({toks}, t -> list_contains({sw}, t)))",
        "n_token_chars": (f"list_reduce(list_prepend(0::INT, "
                          f"list_transform({toks}, t -> length(t)::INT)), (s, v) -> s + v)"),
        "fingerprint": H.duck_combine(th),
    }

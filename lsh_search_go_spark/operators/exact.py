"""Exact deduplication: hash-groupBy on content sha256.

The per-row invariant column ``content_sha = sha2(content, 256)`` demanded by
the target spec doubles as the exact-dup key.  One shuffle on the sha; at
100 TB the groupBy benefits from map-side partial aggregation and AQE
coalescing — no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_sha(df: DataFrame, content_col: str = "content",
                     out_col: str = "content_sha") -> DataFrame:
    return df.withColumn(out_col, F.sha2(F.col(content_col), 256))


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id",
                     content_col: str = "content") -> DataFrame:
    """One row per distinct content: (content_sha, n_dups, canonical_id).

    canonical_id = min id of the group (deterministic representative, the
    same convention the CC stage uses for cluster ids).
    """
    return (
        with_content_sha(df, content_col)
        .groupBy("content_sha")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def exact_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                    content_col: str = "content") -> DataFrame:
    """Canonical (src < dst) pairs of byte-identical documents.

    Implemented as canonical-representative join, not a full self-join: each
    row pairs with its group's min id — the edge set is a star per group,
    which is all connected-components needs downstream.
    """
    sha = with_content_sha(df, content_col).select(
        F.col(id_col).alias("doc_id"), "content_sha"
    )
    reps = sha.groupBy("content_sha").agg(F.min("doc_id").alias("src"))
    return (
        sha.join(reps, "content_sha")
        .filter(F.col("doc_id") != F.col("src"))
        .select(F.col("src").alias("src_id"), F.col("doc_id").alias("dst_id"))
    )

"""Exact nearest-neighbor oracle (brute force).

Reference analog: ``NNMock`` — one bucket holding everything, linear scan +
threshold + heap (/root/reference/annbench/annbench.go:56-125).  In Spark the
"one bucket" is a broadcast of the (small) query set against the corpus —
queries×corpus scored in one JVM stage, then window top-k.  This is both the
correctness baseline for the LSH paths and the ANN fallback when the corpus
side fits a scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsh_search_go_spark.functions.vector import cosine_dist_expr, l2_dist_expr


def _dist(metric: str):
    if metric == "cosine":
        return cosine_dist_expr
    if metric == "l2":
        return l2_dist_expr
    raise ValueError(f"unknown metric {metric!r}")


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int,
                     metric: str = "cosine",
                     id_col: str = "id", vec_col: str = "vec",
                     query_id_col: str = "query_id",
                     query_vec_col: str = "vec",
                     exclude_self: bool = True) -> DataFrame:
    """(query_id, rank, neighbor_id, dist) — exact top-k per query.

    The query side is broadcast (queries ≪ corpus); the corpus side streams —
    no shuffle on the big side at all.
    """
    from lsh_search_go_spark.operators.topk import topk_per_query

    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(query_vec_col).alias("__qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cvec"))
    scored = c.crossJoin(F.broadcast(q))
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn("dist", _dist(metric)("__cvec", "__qvec"))
    return topk_per_query(scored, k).select("query_id", "rank", "neighbor_id", "dist")


def threshold_pairs(corpus: DataFrame, threshold: float, metric: str = "cosine",
                    id_col: str = "id", vec_col: str = "vec") -> DataFrame:
    """All canonical pairs (src < dst) with dist <= threshold (inclusive, as
    /root/reference/lsh/lsh.go:179).  Quadratic — small inputs / oracle only;
    the scale path is LSH + verify."""
    a = corpus.select(F.col(id_col).alias("src_id"), F.col(vec_col).alias("__va"))
    b = corpus.select(F.col(id_col).alias("dst_id"), F.col(vec_col).alias("__vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("src_id") < F.col("dst_id"))
        .withColumn("dist", _dist(metric)("__va", "__vb"))
        .filter(F.col("dist") <= threshold)
        .select("src_id", "dst_id", "dist")
    )

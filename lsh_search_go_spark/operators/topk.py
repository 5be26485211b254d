"""Top-k per query via window functions.

Reference analog: the binary min-heap popped ``maxNN`` times
(/root/reference/lsh/lsh.go:22-47, 194-198).  The heap's arrival-order tie
behavior is non-deterministic; we break ties on the neighbor id so results
are stable across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_query(scored: DataFrame, k: int,
                   query_col: str = "query_id",
                   dist_col: str = "dist",
                   id_col: str = "neighbor_id") -> DataFrame:
    w = Window.partitionBy(query_col).orderBy(F.asc(dist_col), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )

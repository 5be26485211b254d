"""Exact-distance candidate verification.

Reference analog: for each candidate id, fetch the true vector and compute the
exact metric, admit iff ``dist <= threshold`` — inclusive
(/root/reference/lsh/lsh.go:174-190, threshold semantics at lsh/lsh.go:179).
The reference's per-candidate point reads (store/kv/store.go:53-62) become one
bulk join against the signatures relation — point lookups never survive at
Spark scale.

Jaccard here is exact set Jaccard over the (distinct, sorted) shingle-hash
arrays: ``J = |A ∩ B| / |A ∪ B|``, computed with JVM ``array_intersect``
(sizes only — the union size is |A|+|B|-|inter|, no union materialized).
``inter >= t * uni`` is mathematically identical to ``J >= t`` and keeps the
comparison in (int, double-product) form, bit-identical across engines.

A cheap size prefilter runs before the intersect: J >= t implies
``min(|A|,|B|) >= t * max(|A|,|B|)``.  On LSH candidates it prunes little,
but at 100 TB it's free insurance against adversarial buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_verify(pairs: DataFrame, shingled: DataFrame,
                   threshold: float, id_col: str = "doc_id",
                   shingles_col: str = "shingles",
                   prefilter: bool = True) -> DataFrame:
    """pairs(src_id, dst_id) × shingled(id, shingles) → verified dup pairs
    (src_id, dst_id, inter, uni, jaccard) with jaccard >= threshold."""
    s = shingled.select(F.col(id_col), F.col(shingles_col))
    src = s.select(F.col(id_col).alias("src_id"), F.col(shingles_col).alias("__sh_src"),
                   F.size(shingles_col).alias("__n_src"))
    dst = s.select(F.col(id_col).alias("dst_id"), F.col(shingles_col).alias("__sh_dst"),
                   F.size(shingles_col).alias("__n_dst"))
    joined = pairs.join(src, "src_id").join(dst, "dst_id")
    if prefilter:
        joined = joined.filter(
            F.least("__n_src", "__n_dst")
            >= F.lit(threshold) * F.greatest("__n_src", "__n_dst")
        )
    scored = joined.withColumn(
        "inter", F.size(F.array_intersect("__sh_src", "__sh_dst"))
    ).withColumn(
        "uni", F.col("__n_src") + F.col("__n_dst") - F.col("inter")
    )
    return (
        scored.filter((F.col("uni") > 0)
                      & (F.col("inter") >= F.lit(threshold) * F.col("uni")))
        .withColumn("jaccard", F.col("inter").cast("double") / F.col("uni"))
        .select("src_id", "dst_id", "inter", "uni", "jaccard")
    )


def hamming_verify(pairs: DataFrame, signed: DataFrame, threshold: int,
                   id_col: str = "doc_id", sim_col: str = "simhash") -> DataFrame:
    """pairs × simhash signatures → (src_id, dst_id, hamming <= threshold)."""
    from lsh_search_go_spark.functions.simhash import hamming_expr

    s = signed.select(F.col(id_col), F.col(sim_col))
    src = s.select(F.col(id_col).alias("src_id"), F.col(sim_col).alias("__s_src"))
    dst = s.select(F.col(id_col).alias("dst_id"), F.col(sim_col).alias("__s_dst"))
    return (
        pairs.join(src, "src_id").join(dst, "dst_id")
        .withColumn("hamming", hamming_expr("__s_src", "__s_dst"))
        .filter(F.col("hamming") <= threshold)
        .select("src_id", "dst_id", "hamming")
    )

"""Banded LSH bucketing and candidate-pair generation.

Reference analog: ``SetHash`` appends doc ids to bucket ``{tree}_{hash}``
(/root/reference/store/kv/store.go:64-73); ``Search`` pulls same-bucket ids as
candidates (/root/reference/lsh/lsh.go:154-172) and dedups them via
``closestSet`` (/root/reference/lsh/lsh.go:142,171).

Spark realization:
- buckets table via ``posexplode`` of the per-doc band-hash array — one
  narrow (band_id int, band_hash bigint, doc_id) relation, shuffled once on
  the bucket key;
- candidate pairs via bucket self-join + ``dropDuplicates`` BEFORE the
  expensive verify join (the reference's closestSet, done set-wise);
- skew guard: buckets above ``max_bucket_size`` are dropped and *logged* —
  a bucket of n docs yields n(n-1)/2 pairs, so one degenerate bucket (e.g.
  the empty-file bucket at code-corpus scale) would dominate the whole job.
  This is the deterministic analog of the reference's arrival-order-dependent
  ``maxCandidates`` early exit (/root/reference/lsh/lsh.go:145,163-166),
  which we deliberately do NOT replicate (non-deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_bands(df: DataFrame, id_col: str = "doc_id",
                  bands_col: str = "bands") -> DataFrame:
    """(id, array<bigint> bands) → (band_id int, band_hash bigint, id)."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(bands_col)).alias("band_id", "band_hash"),
    )


def oversized_buckets(buckets: DataFrame, max_bucket_size: int) -> DataFrame:
    """Buckets whose membership exceeds the skew cap — for logging/metrics."""
    return (
        buckets.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def candidate_pairs(buckets: DataFrame, id_col: str = "doc_id",
                    max_bucket_size: int | None = None,
                    strategy: str = "join",
                    sizes: DataFrame | None = None) -> DataFrame:
    """Distinct canonical candidate pairs (src_id < dst_id) from bucket
    co-membership.

    strategy="join" (default): self-join on the bucket key (+ a size-filter
    join when capped).  More shuffles of the bucket relation than "groupby",
    but every operator stays in whole-stage codegen — measured 2× faster than
    the collect_list route (ObjectHashAggregate doesn't codegen and builds a
    per-partition object map over mostly-singleton buckets).  Callers should
    feed NARROW ids (e.g. an xxhash64 surrogate key) — shuffle bytes scale
    with id width.

    strategy="groupby": ONE shuffle — groupBy bucket key, collect the member
    list (after an anti-join against oversized buckets so no giant array ever
    materializes), expand within-bucket pairs with nested transforms, then
    the distinct.  The single-shuffle shape can win when the bucket relation
    is too wide to shuffle twice.  The cap is what bounds the n²/2 expansion
    per bucket in both strategies (reference ``maxCandidates`` analog done
    deterministically — SURVEY §7.0).

    ``sizes``: optional precomputed ``groupBy(band_id, band_hash).count`` as
    ``bucket_size`` — callers that also LOG oversized buckets pass the same
    (persisted) relation here so the aggregation runs once, not twice.
    """
    if strategy == "join":
        if max_bucket_size is not None:
            if sizes is None:
                sizes = buckets.groupBy("band_id", "band_hash").agg(
                    F.count(F.lit(1)).alias("bucket_size")
                )
            buckets = (
                buckets.join(sizes, ["band_id", "band_hash"])
                .filter(F.col("bucket_size") <= max_bucket_size)
                .drop("bucket_size")
            )
        left = buckets.select("band_id", "band_hash", F.col(id_col).alias("src_id"))
        right = buckets.select("band_id", "band_hash", F.col(id_col).alias("dst_id"))
        return (
            left.join(right, ["band_id", "band_hash"])
            .filter(F.col("src_id") < F.col("dst_id"))
            .select("src_id", "dst_id")
            .dropDuplicates(["src_id", "dst_id"])
        )
    if strategy != "groupby":
        raise ValueError(f"unknown strategy {strategy!r}")

    if max_bucket_size is not None:
        # anti-join the (tiny by construction) oversized-bucket set BEFORE
        # collect_list — a degenerate bucket must never materialize as one
        # giant array in a single aggregation buffer.
        big = oversized_buckets(buckets, max_bucket_size) \
            .select("band_id", "band_hash")
        buckets = buckets.join(F.broadcast(big), ["band_id", "band_hash"],
                               "left_anti")
    grouped = buckets.groupBy("band_id", "band_hash").agg(
        F.array_sort(F.collect_list(id_col)).alias("__ids")
    )
    grouped = grouped.filter(F.size("__ids") >= 2)
    pair_expr = (
        "flatten(transform(__ids, (x, i) -> "
        "transform(slice(__ids, i + 2, size(__ids) - i - 1), "
        "y -> named_struct('src_id', x, 'dst_id', y))))"
    )
    return (
        grouped.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.src_id", "p.dst_id")
        .dropDuplicates(["src_id", "dst_id"])
    )

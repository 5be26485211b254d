"""Incremental (streaming) index maintenance.

The reference is strictly batch (Train rebuilds the world,
/root/reference/lsh/lsh.go:107-136); at corpus scale re-hashing everything per
drop is not viable.  This module keeps the signature/bucket tables current as
new code files arrive, via Structured Streaming over a directory source:

    new files → (same shingle/minhash/simhash UDFs) → append signatures
    + exploded buckets, exactly-once per micro-batch via foreachBatch.

Candidate pairing/clustering stay batch jobs over the maintained tables —
LSH bucketing is what makes that incremental-friendly: a new document only
ever pairs with members of the buckets it lands in, so the periodic pair job
can filter to buckets touched since the last checkpoint (the ``_ingested_at``
watermark column).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsh_search_go_spark.config import DedupConfig
from lsh_search_go_spark.functions import hashing as H
from lsh_search_go_spark.functions.shingles import with_shingles
from lsh_search_go_spark.functions.simhash import with_simhash
from lsh_search_go_spark.operators.bands import explode_bands

CODE_FILES_SCHEMA = ("repo string, path string, commit string, "
                     "lang string, content string")


def _transform_batch(batch: DataFrame, cfg: DedupConfig, impl: str) -> DataFrame:
    df = batch
    if cfg.id_col not in df.columns:
        df = df.withColumn(
            cfg.id_col, F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256)
        )
    df = df.withColumn("content_sha", F.sha2(F.col(cfg.content_col), 256))
    df = with_shingles(df, cfg, impl)
    df = H.with_minhash_bands(df, cfg, impl)
    df = with_simhash(df, cfg, impl)
    return df.select(cfg.id_col, "content_sha", "shingles", "minhash",
                     "bands", "simhash",
                     F.current_timestamp().alias("_ingested_at"))


def latest_epoch(spark: SparkSession, out_dir: str) -> int:
    """Highest ``_epoch`` committed to the signatures table (−1 if the table
    is empty).  The round protocol for exactly-once pair emission:

    1. run the ingest query to quiescence (``availableNow`` trigger +
       ``awaitTermination``, as :func:`start_incremental_ingest` documents);
    2. ``e = latest_epoch(...)``;
    3. ``incremental_pairs(..., since=prev_e)`` — epochs in
       ``(prev_e, e]`` are "new";
    4. ``prev_e = e`` for the next round.

    Epochs are the streaming checkpoint's own monotone micro-batch ids, so
    unlike the wall-clock ``_ingested_at`` bound there is no tie to straddle:
    a document is either in an epoch ≤ ``prev_e`` (already paired) or not.
    The QUIESCE in step 1 is still required — capturing the watermark while
    a micro-batch commits concurrently can classify its documents as old
    before their pairs were ever emitted (r4 ADVICE)."""
    import os as _os

    sig_path = _os.path.join(out_dir, "signatures")
    sigs = spark.read.parquet(sig_path)
    if "_epoch" not in sigs.columns:
        raise ValueError(
            f"signatures at {sig_path!r} carry no _epoch column (written by "
            "a pre-epoch ingest); re-ingest, or use a timestamp `since` "
            "bound with an explicitly quiesced capture")
    row = sigs.agg(F.max("_epoch").alias("e")).head()
    return -1 if row["e"] is None else int(row["e"])


def start_incremental_ingest(spark: SparkSession, source_dir: str, out_dir: str,
                             cfg: DedupConfig, impl: str = "pandas",
                             checkpoint_dir: str | None = None,
                             max_files_per_trigger: int = 64):
    """Start the streaming query.  Returns the StreamingQuery handle; callers
    use ``processAllAvailable()`` in tests / ``awaitTermination()`` in prod.

    Sinks: ``{out_dir}/signatures`` and ``{out_dir}/buckets`` (parquet,
    append).  foreachBatch writes both tables in one epoch."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    stream = (
        spark.readStream.schema(CODE_FILES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def sink(batch: DataFrame, epoch_id: int) -> None:
        # _epoch = the checkpointed micro-batch id: the monotone, tie-free
        # watermark unit `incremental_pairs` keys its "new since" bound on
        # (wall-clock `_ingested_at` is kept for humans/retention policies)
        out = (_transform_batch(batch, cfg, impl)
               .withColumn("_epoch", F.lit(int(epoch_id)))
               .persist())
        try:
            out.write.mode("append").parquet(os.path.join(out_dir, "signatures"))
            explode_bands(out.filter(F.size("shingles") > 0), cfg.id_col, "bands") \
                .write.mode("append").parquet(os.path.join(out_dir, "buckets"))
        finally:
            out.unpersist()

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_pairs(spark: SparkSession, out_dir: str, cfg: DedupConfig,
                      since=None, only_new: bool = True,
                      strategy: str = "minhash") -> DataFrame:
    """Verified duplicate pairs from the maintained signature/bucket tables,
    optionally restricted to buckets TOUCHED after ``since`` — the
    incremental pair job the module docstring promises.

    ``since``: an ``int`` is an EPOCH bound — documents with ``_epoch >
    since`` are new (the recommended scheme; see :func:`latest_epoch` for
    the round protocol and why epochs cannot tie).  Any other non-None value
    is a timestamp compared against ``_ingested_at`` (legacy); wall-clock
    bounds are only sound when the capture of ``since`` happened with the
    ingest QUIESCED — a micro-batch committing between the capture and this
    read (or tying at the same timestamp) is permanently classified old and
    its cross-bucket pairs are never emitted (r4 ADVICE).  ``None`` pairs
    the whole table (the batch job over the maintained state).

    With ``since`` set, only buckets containing at least one newer document
    are scanned, and with ``only_new`` (default) only pairs touching a newer
    document are emitted — an older pair sharing only old buckets was
    already emitted by the run that ingested its later member, so the
    CUMULATIVE union over micro-batch rounds equals the one-shot batch pair
    set (tested in ``test_incremental_pairs_cumulative_equals_batch`` and
    ``..._simhash``).

    ``strategy``: "minhash" (default) pairs via the maintained band buckets
    and exact-Jaccard verify, returning (src_id, dst_id, inter, uni,
    jaccard); "simhash" derives bit-slice buckets from the maintained
    ``simhash`` column (the batch pipeline's ``pairs_strategy="simhash"``
    shape) and Hamming-verifies, returning (src_id, dst_id, hamming).  Both
    canonicalize src < dst.

    Caveat (documented, deliberate): the ``max_bucket_size`` skew cap is
    evaluated against the bucket's CURRENT size.  A bucket that outgrows the
    cap between rounds keeps the pairs emitted while it was small, whereas a
    from-scratch batch run drops the whole bucket — at scale that is the
    desirable behavior (early pairs remain valid dup evidence; the cap
    exists to bound n² expansion, not to define semantics).
    """
    from lsh_search_go_spark.operators.bands import candidate_pairs
    from lsh_search_go_spark.operators.verify import hamming_verify, jaccard_verify

    sigs = spark.read.parquet(os.path.join(out_dir, "signatures"))
    if strategy == "simhash":
        from lsh_search_go_spark.functions.simhash import simhash_band_hashes

        banded = (sigs.filter(F.size("shingles") > 0)
                  .withColumn("__sbands", simhash_band_hashes(
                      "simhash", cfg, cfg.simhash_bands)))
        buckets = explode_bands(banded, cfg.id_col, "__sbands")
    elif strategy == "minhash":
        buckets = spark.read.parquet(os.path.join(out_dir, "buckets"))
    else:
        raise ValueError(f"unknown pairs strategy {strategy!r}")
    new_ids = None
    if since is not None:
        if isinstance(since, bool):
            raise TypeError("`since` must be an epoch int or a timestamp")
        if isinstance(since, int):
            if "_epoch" not in sigs.columns:
                raise ValueError(
                    "epoch `since` bound requested but the signatures table "
                    "carries no _epoch column (pre-epoch ingest); re-ingest "
                    "or pass a timestamp")
            newer = F.col("_epoch") > F.lit(since)
        else:
            newer = F.col("_ingested_at") > F.lit(since)
        new_ids = sigs.filter(newer).select(cfg.id_col).distinct()
        touched = (buckets.join(new_ids, cfg.id_col)
                   .select("band_id", "band_hash").distinct())
        # touched keys are bounded by (new docs × bands) — broadcastable for
        # micro-batch-sized deltas, which is the whole point of the filter
        buckets = buckets.join(F.broadcast(touched), ["band_id", "band_hash"])
    cands = candidate_pairs(buckets, cfg.id_col, cfg.max_bucket_size)
    if new_ids is not None and only_new:
        is_new = new_ids.select(F.col(cfg.id_col))
        cands = cands.join(
            is_new.select(F.col(cfg.id_col).alias("src_id"))
                  .withColumn("__src_new", F.lit(True)),
            "src_id", "left",
        ).join(
            is_new.select(F.col(cfg.id_col).alias("dst_id"))
                  .withColumn("__dst_new", F.lit(True)),
            "dst_id", "left",
        ).filter(F.col("__src_new").isNotNull() | F.col("__dst_new").isNotNull()
        ).select("src_id", "dst_id")
    if strategy == "simhash":
        return hamming_verify(cands, sigs, cfg.hamming_threshold, cfg.id_col)
    return jaccard_verify(cands, sigs, cfg.jaccard_threshold, cfg.id_col,
                          "shingles")

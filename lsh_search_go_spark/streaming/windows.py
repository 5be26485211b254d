"""Watermarked event-time window aggregation (Structured Streaming idiom).

The ingestion-monitoring side of the pipeline: as corpus drops stream in,
per-window counts/volumes per event type feed the lineage/metrics tables
(N7) without a batch recompute.  Late events beyond the watermark are
DROPPED by the engine — the deterministic, documented alternative to
unbounded state growth.

The same plan works on a batch DataFrame (window() is an ordinary grouping
expression there), which is what the DuckDB-gated ``event_window_stats``
query checks: the streaming aggregation and the batch aggregation are the
same logical plan, differing only in source and output mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(events: DataFrame, window: str = "10 minutes",
                         watermark: str | None = "30 minutes",
                         ts_col: str = "ts",
                         type_col: str = "event_type") -> DataFrame:
    """(window_start, window_end, event_type, n_events, total_value).

    With ``watermark`` set and a streaming source, append-mode output emits a
    window only once it is final (watermark passed) and silently drops events
    later than the watermark — exactly-once per window.  Pass
    ``watermark=None`` for batch use (watermarks are streaming-only state
    bounds; on a batch plan the call is a no-op anyway)."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), F.col(type_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                type_col, "n_events", "total_value")
    )


def start_windowed_stats_stream(spark, source_dir: str, checkpoint_dir: str,
                                schema: str, sink_dir: str,
                                window: str = "10 minutes",
                                watermark: str = "30 minutes"):
    """File-source → append-mode parquet sink (fault-tolerant: the watermark
    state lives in the checkpoint, so a restarted query keeps dropping events
    older than the recovered watermark).  Returns the StreamingQuery."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_stats(stream, window, watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet").option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

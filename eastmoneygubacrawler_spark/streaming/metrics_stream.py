"""Structured-Streaming ingestion of crawl events (§2.9).

The reference's "streaming" is a poll loop (T1, core/scheduler.py:259-293) —
rounds ARE micro-batches, so the engine core needs no streaming.  This module
is the incremental-ingest path for the surrounding pipeline: crawl workers
append event files (url, host, ts, status, bytes); a streaming job folds them
into windowed per-host health metrics with a watermark for stragglers — the
live version of the crawl_log table.

``Trigger.availableNow`` makes the same job runnable as a batch catch-up
(exactly the reference's poll-loop semantics), which is how the test drives
it deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = "url string, host string, ts timestamp, status string, bytes long"


def crawl_metrics_stream(
    spark: SparkSession, events_dir: str, window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """File-source stream → watermarked windowed per-host fetch metrics."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(events_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("host"))
        .agg(
            F.count("*").alias("fetched"),
            F.sum((F.col("status") == "ok").cast("long")).alias("ok"),
            F.sum("bytes").alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "host", "fetched", "ok", "bytes",
        )
    )


def run_metrics_stream_once(
    spark: SparkSession, events_dir: str, out_dir: str, checkpoint_dir: str,
    window: str = "1 minute",
) -> None:
    """Drain all available input (availableNow) into a parquet metrics sink —
    the poll-loop form: each invocation processes exactly the new files."""
    q = (
        crawl_metrics_stream(spark, events_dir, window)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

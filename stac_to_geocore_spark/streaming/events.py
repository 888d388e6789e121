"""Structured Streaming surface over the events table.

The reference is a daily batch (EventBridge rate(1 day), template.yaml:73)
— no streaming exists there. This module is the engine's incremental-ingest
path: the same event analytics queries() exposes in batch
(events_hourly / events_sessions) re-expressed as readStream plans with
watermarked event-time windows, so a continuous harvest feeds the same
downstream tables.

- `windowed_event_counts`: tumbling event-time window + watermark (late data
  beyond the watermark is dropped, counts are append-finalized).
- `sessionize_stream`: session windows via the built-in
  F.session_window(gap) — the watermark closes sessions; equivalent to the
  batch lag()>gap sessionization on completed data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events_from_dir(spark: SparkSession, dir_path: str, max_files: int = 1) -> DataFrame:
    """File-source stream (one parquet drop per micro-batch in tests; swap
    for kafka/rate sources on a cluster — same downstream plan)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(dir_path)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("s.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )

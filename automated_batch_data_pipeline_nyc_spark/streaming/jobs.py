"""Structured Streaming surface (SURVEY.md §2.8).

The reference is batch-only; its README claims (but never implements)
monthly incremental loading (README.md:220-222).  This module supplies
the streaming equivalent of the reference's hour-bucket enrichment
(F1/F2): a file-source stream over the events table, watermarked
tumbling-window aggregation, and an append-mode Parquet sink.

Scale notes:
- File source discovers new files per micro-batch — the idiomatic
  incremental-load mechanism (new month = new partition directory).
- The watermark bounds state: late events beyond 1 hour are dropped
  rather than growing the state store without bound.
- ``trigger(availableNow=True)`` gives batch-like "process the backlog
  then stop" semantics — used by tests and by incremental backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["EVENTS_STREAM_SCHEMA", "read_event_stream", "windowed_event_counts", "write_stream_to_parquet"]

#: Schema must be explicit for streaming file sources (no inference).
EVENTS_STREAM_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])


def read_event_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark — the
    streaming rendition of the reference's hour-bucket CASE (M1/F1)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def write_stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    output_mode: str = "append",
):
    """Append-mode Parquet sink; ``availableNow`` processes the current
    backlog then stops (incremental batch)."""
    writer = (
        df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

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

__all__ = [
    "EVENTS_STREAM_SCHEMA",
    "read_event_stream",
    "windowed_event_counts",
    "sessionize_stream",
    "write_stream_to_parquet",
]

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


def sessionize_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """Custom stateful operator: gap-based sessionization over
    ``applyInPandasWithState`` — the streaming twin of
    ``operators.windows.sessionize``.

    Per-user state carries (session_start, last_ts, n_events); a
    session is EMITTED when a later event from the same user arrives
    past the gap (so each user's final session stays open in the state
    store — batch comparison must exclude per-user last sessions).
    State is bounded by active users, not history; at scale add an
    event-time timeout to flush idle users.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
    ])
    state_schema = T.StructType([
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ])
    gap_us = gap_s * 1_000_000

    # closure-pure kernel: stdlib + pandas only (workers import nothing
    # from this package)
    def fn(key, pdfs, state: GroupState):
        import pandas as _pd

        rows = _pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        # Arrow hands timestamps to pandas as datetime64[ns]; normalize
        # to us before integer math so epoch arithmetic is unit-stable.
        ts_us = rows["ts"].astype("datetime64[us]").astype("int64")
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = n = None
        closed = []
        for t in ts_us:
            t = int(t)
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((int(key[0]), start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        state.update((start_us, last_us, n))
        if closed:
            out = _pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
            )
            out["session_start"] = _pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = _pd.to_datetime(out["session_end"], unit="us")
            yield out

    clean = stream.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
    return clean.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
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

from .jobs import (
    dedup_stream,
    enrich_stream_static,
    foreach_batch_upsert,
    read_event_stream,
    sessionize_stream,
    windowed_event_counts,
    write_stream_to_parquet,
)

__all__ = [
    "dedup_stream",
    "enrich_stream_static",
    "foreach_batch_upsert",
    "read_event_stream",
    "sessionize_stream",
    "windowed_event_counts",
    "write_stream_to_parquet",
]

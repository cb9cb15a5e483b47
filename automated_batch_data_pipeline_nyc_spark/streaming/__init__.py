from .jobs import (
    read_event_stream,
    sessionize_stream,
    windowed_event_counts,
    write_stream_to_parquet,
)

__all__ = [
    "read_event_stream",
    "sessionize_stream",
    "windowed_event_counts",
    "write_stream_to_parquet",
]

from .incremental import (
    stream_source,
    windowed_counts,
    streaming_sessionize,
    incremental_merge_stream,
)

__all__ = [
    "stream_source",
    "windowed_counts",
    "streaming_sessionize",
    "incremental_merge_stream",
]

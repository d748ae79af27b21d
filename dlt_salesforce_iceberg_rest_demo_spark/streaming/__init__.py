from .incremental import (
    stream_source,
    windowed_counts,
    streaming_sessionize,
    incremental_merge_stream,
    stateful_user_totals,
)

__all__ = [
    "stream_source",
    "windowed_counts",
    "streaming_sessionize",
    "incremental_merge_stream",
    "stateful_user_totals",
]

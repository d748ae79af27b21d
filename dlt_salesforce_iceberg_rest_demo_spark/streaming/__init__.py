from .incremental import (
    stream_source,
    windowed_counts,
    streaming_sessionize,
    incremental_merge_stream,
    stateful_user_totals,
    streaming_heavy_hitters,
    stateful_user_totals_tws,
    dedup_within_watermark,
    stream_stream_interval_join,
    stream_static_enrich,
    streaming_ohlc,
)

__all__ = [
    "stream_source",
    "windowed_counts",
    "streaming_sessionize",
    "incremental_merge_stream",
    "stateful_user_totals",
    "streaming_heavy_hitters",
    "stateful_user_totals_tws",
    "dedup_within_watermark",
    "stream_stream_interval_join",
    "stream_static_enrich",
    "streaming_ohlc",
]

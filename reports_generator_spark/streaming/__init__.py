from .windowed import (
    stream_dedup_keys,
    stream_stream_interval_join,
    stream_tumbling_agg,
)

__all__ = [
    "stream_tumbling_agg",
    "stream_dedup_keys",
    "stream_stream_interval_join",
]

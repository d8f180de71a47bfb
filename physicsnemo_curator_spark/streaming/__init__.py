"""Structured-streaming variants of the stateful operators."""

from physicsnemo_curator_spark.streaming.windows import (
    session_window_agg,
    sliding_window_stats,
    tumbling_window_stats,
)

__all__ = [
    "tumbling_window_stats",
    "sliding_window_stats",
    "session_window_agg",
]

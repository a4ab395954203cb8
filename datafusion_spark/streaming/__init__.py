"""Structured Streaming counterparts of the batch operators."""

from datafusion_spark.streaming.ops import (
    click_purchase_join,
    dedup_within_watermark,
    read_events_stream,
    sessionize_stateful,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "sessionize_stateful",
    "click_purchase_join",
    "dedup_within_watermark",
]

"""Structured Streaming counterparts of the batch operators."""

from datafusion_spark.streaming.ops import (
    click_purchase_join,
    click_purchase_join_full,
    click_purchase_join_outer,
    click_purchase_join_right,
    click_purchase_join_semi,
    dedup_within_watermark,
    foreach_batch_append_sink,
    read_events_stream,
    read_latest_per_user,
    running_totals_tws,
    session_window_counts,
    sessionize_stateful,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_window_counts",
    "sessionize_stateful",
    "click_purchase_join",
    "click_purchase_join_full",
    "click_purchase_join_outer",
    "click_purchase_join_right",
    "click_purchase_join_semi",
    "dedup_within_watermark",
    "foreach_batch_append_sink",
    "read_latest_per_user",
    "running_totals_tws",
]

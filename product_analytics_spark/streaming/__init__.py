"""Structured Streaming twins of the batch operators.

The reference pipeline is batch micro-increments (SURVEY.md §2.9):
high-watermark filter + latest-record dedup + merge is exactly what
Structured Streaming does with watermark + dropDuplicates + foreachBatch
merge. This package provides those streaming forms; the batch forms in
``operators/`` remain the oracle-checkable source of truth.
"""

from product_analytics_spark.streaming.ops import (  # noqa: F401
    cdc_latest_stream,
    foreach_batch_merge,
    interval_join_stream,
    run_available_now,
    session_window_agg_stream,
    sessionize_stateful,
    stream_table,
    tumbling_window_agg_stream,
)

"""Streaming DAG runner — the dbt-on-streams execution mode.

The batch registry (plans/registry.py) runs the bronze→silver→gold
DAG once per invocation. This module drives the SAME registry from a
Structured Streaming source: the CDC landing zone streams file-by-file
(each arriving file = one micro-batch), and ``foreachBatch`` runs an
INCREMENTAL registry pass per trigger — the high-watermark predicate
(P6) and versioned MERGE (S4/X118) make each pass idempotent, so the
final snapshots equal a batch replay of the same feed. No new
semantics: the streaming mode is the batch incremental mode with the
engine's own trigger loop deciding the batch boundaries (exactly how
dbt-on-Databricks jobs move to continuous mode).

At scale: the stream's checkpoint carries source offsets, so restarts
resume exactly-once (tests/test_streaming.py::TestCheckpointRestart
proves the mechanism); each trigger's work is delta-sized while the
snapshot store holds full history.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from product_analytics_spark.plans.registry import ModelRegistry
from product_analytics_spark.sources.sinks import SnapshotStore
from product_analytics_spark.streaming.ops import stream_table


def run_streaming_dag(
    spark: SparkSession,
    store: SnapshotStore,
    registry: ModelRegistry,
    stream_source: str,
    landing_dir: str,
    landing_schema: T.StructType,
    static_sources: Mapping[str, DataFrame],
    select: set[str] | None = None,
    max_files_per_trigger: int = 1,
    timeout_s: float = 300.0,
) -> dict[str, int]:
    """Stream ``landing_dir`` (the CDC feed named ``stream_source``)
    and run an incremental registry pass per micro-batch, joining in
    ``static_sources`` (stream-static, the q169 pattern) for the other
    feeds. Returns {batch_id: rows_in_batch} as the run journal.

    availableNow: processes everything currently landed, then stops —
    the backfill/catch-up mode; a production deployment swaps the
    trigger for a processing-time one and keeps the same semantics."""
    journal: dict[str, int] = {}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        journal[str(batch_id)] = n
        if n == 0:
            return
        sources = dict(static_sources)
        sources[stream_source] = batch_df
        registry.run(store, sources, select=select)

    stream = stream_table(
        spark,
        landing_dir,
        landing_schema,
        max_files_per_trigger=max_files_per_trigger,
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_s)
    q.stop()
    if not finished:
        # Stopping a live query mid-batch leaves the journal and the
        # snapshot store partially updated; surface that instead of
        # returning silently-partial state.
        raise TimeoutError(
            f"streaming DAG run did not drain within {timeout_s}s; "
            f"journal so far: {journal}"
        )
    return journal

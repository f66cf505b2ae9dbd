"""Round-3 driver query families, batch 17 (q200+): streaming
foreachBatch incremental MERGE parity, and watermark late-data
drop accounting — the two Structured-Streaming semantics not yet
driver-evidenced (both pytest-covered since round 1/2).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t, local_rows_df

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ------------------------------------------------------------- q200

Q200_LAND = os.path.join(_REPO, ".fixtures", ".q200_stream_land")
Q200_CKPT = os.path.join(_REPO, ".fixtures", ".q200_stream_ckpt")
Q200_SPLIT = "1997-01-01"


def q200_streaming_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 driver evidence: streaming incremental MERGE — the
    Structured-Streaming form of the reference's dbt incremental
    materialization (customers_latest.sql:3-6's MERGE), run as a REAL
    stream: the CDC log lands as two files (pre/post-1997 orders),
    streams one file per micro-batch, and `foreachBatch` upserts each
    batch into an in-memory snapshot via the SAME batch merge kernel
    (operators/incremental.py:merge_upsert_versioned) the batch path
    uses — batch/stream share one merge implementation, so parity is
    structural, not coincidental. The readout is the final snapshot:
    every customer's latest order; the oracle computes it in one
    batch argmax. Out-of-order delivery is covered by construction —
    the OLD file is streamed AFTER the new one and must not clobber.

    Scale: each micro-batch merge is the anti-join+union described in
    SCALE.md (batch side broadcastable); checkpointing makes the
    stream restartable; at 100 TB the snapshot side is a Delta MERGE
    rewriting only matched files."""
    from product_analytics_spark.operators import incremental
    from product_analytics_spark.operators.dedup import latest_by_key
    from product_analytics_spark.streaming import ops as st

    from product_analytics_spark.qcommon import land_once

    # Checkpoint must be cleared EVERY run (a completed availableNow
    # checkpoint would replay zero batches); the landing is memoized.
    shutil.rmtree(Q200_CKPT, ignore_errors=True)

    def _land() -> None:
        o = _t(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate"
        )
        cut = F.lit(Q200_SPLIT).cast("timestamp")
        # file 1 = NEW data, file 2 = OLD data (deliberately out of order)
        o.filter(F.col("o_orderdate") >= cut).repartition(1).write.mode(
            "overwrite"
        ).parquet(Q200_LAND)
        o.filter(F.col("o_orderdate") < cut).repartition(1).write.mode(
            "append"
        ).parquet(Q200_LAND)

    land_once(Q200_LAND, sf_dir, _land)
    schema = spark.read.parquet(Q200_LAND).schema

    state = {"snap": None}

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        batch_latest = latest_by_key(
            batch_df, key="o_custkey", order_by=("o_orderdate", "o_orderkey")
        ).localCheckpoint(eager=True)
        if state["snap"] is None:
            state["snap"] = batch_latest
        else:
            state["snap"] = incremental.merge_upsert_versioned(
                state["snap"],
                batch_latest,
                key="o_custkey",
                ts_col="o_orderdate",
                tiebreak_col="o_orderkey",
            ).localCheckpoint(eager=True)

    stream = st.stream_table(spark, Q200_LAND, schema, max_files_per_trigger=1)
    q = (
        st.foreach_batch_merge(stream, _merge, Q200_CKPT)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = state["snap"]
    return snap.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_order_date"),
    )


Q200_SQL = """
SELECT o_custkey, o_orderkey, o_orderstatus,
       strftime(o_orderdate, '%Y-%m-%d') AS latest_order_date
FROM (
  SELECT o_custkey, o_orderkey, o_orderstatus,
         CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS TIMESTAMP) DESC,
                                     o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


# ------------------------------------------------------------- q201

Q201_LAND = os.path.join(_REPO, ".fixtures", ".q201_stream_land")
Q201_DELAY = "2 hours"
Q201_CUT = "2024-01-20 00:00:00"


def q201_append_mode_finalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 driver evidence: APPEND-mode window finalization — each
    1-day window is emitted EXACTLY ONCE, only after the event-time
    watermark passes its end (q113's tumbling parity runs complete
    mode, which re-emits all state every trigger; append is the
    at-scale mode — sink receives each window once, state evicts).
    The stream is deliberately adversarial: file 1 = the NEW half
    (advances the watermark to max−2h), file 2 = the OLD half
    arriving far below the watermark, file 3 = a far-future flush
    sentinel that pushes the watermark past every real window so the
    final days emit before availableNow terminates (its own window
    never finalizes and is absent by construction).

    Measured semantics worth recording: Spark does NOT drop the old
    rows (`numRowsDroppedByWatermark` = 0) — the watermark contract
    guarantees no-drop within the delay, and dropping beyond it is
    best-effort; here the engine aggregates the late rows and
    finalizes their already-closed windows in the same micro-batch.
    The deterministic, oracle-checkable invariant is therefore
    exactly-once emission with complete per-day totals: sink ==
    batch aggregate over ALL events, each day exactly once (a
    double-emission would double the row count and fail the gate).

    Scale: append + eviction is what bounds a 24×7 windowed agg's
    state; the flush sentinel is the standard end-of-backfill
    pattern to force tail-window emission."""
    from product_analytics_spark.streaming import ops as st

    from product_analytics_spark.qcommon import land_once

    def _land() -> None:
        ev = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
        cut = F.lit(Q201_CUT).cast("timestamp")
        ev.filter(F.col("ts") >= cut).repartition(1).write.mode(
            "overwrite"
        ).parquet(Q201_LAND)
        ev.filter(F.col("ts") < cut).repartition(1).write.mode("append").parquet(
            Q201_LAND
        )
        # terminal FLUSH file: one far-future sentinel event whose arrival
        # pushes the watermark past every real window's end, forcing the
        # append-mode sink to emit them (without it the final days' windows
        # never finalize before availableNow terminates); its own window
        # never appears in the output because the watermark never passes
        # its end, so append mode never emits it
        flush = local_rows_df(spark, 
            [(-1, "2024-02-15 00:00:00", "flush")],
            "event_id long, ts string, event_type string",
        ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
        flush.repartition(1).write.mode("append").parquet(Q201_LAND)

    land_once(Q201_LAND, sf_dir, _land)
    schema = spark.read.parquet(Q201_LAND).schema
    stream = (
        st.stream_table(spark, Q201_LAND, schema, max_files_per_trigger=1)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", Q201_DELAY)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        st.run_available_now(stream, "q201_sink", output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.table("q201_sink")
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )


Q201_SQL = """
SELECT strftime(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE), '%Y-%m-%d')
         AS day,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1
"""


QUERIES_EXT17 = {
    "q200_streaming_merge_parity": q200_streaming_merge_parity,
    "q201_append_mode_finalization": q201_append_mode_finalization,
}

ORACLES_EXT17 = {
    "q200_streaming_merge_parity": Q200_SQL,
    "q201_append_mode_finalization": Q201_SQL,
}

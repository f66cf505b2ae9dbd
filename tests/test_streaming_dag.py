"""Streaming-DAG equivalence: driving the bronze→silver→gold registry
from a REAL Structured Streaming source must land the same snapshots
as the batch incremental replay of the same feed.

This is the §5.3 incremental-equivalence property with the engine's
own trigger loop choosing the batch boundaries instead of the test.
"""

from __future__ import annotations

import datetime as dt
import os
import pathlib

from pyspark.sql import functions as F

from product_analytics_spark.models.pipeline import build_registry
from product_analytics_spark.sources.sinks import SnapshotStore
from product_analytics_spark.streaming.pipeline import run_streaming_dag
from tests.fixtures_cdc import make_cdc_frames

AS_OF = dt.date(2024, 6, 30)
AS_OF_TS = dt.datetime(2024, 6, 30, 12, 0, 0)


def _snap(df, key):
    rows = df.collect()
    out = {}
    for r in rows:
        d = r.asDict()
        d.pop("updated_at", None)  # wall-clock column, excluded like the driver
        out[d[key]] = d
    return out


class TestStreamingDag:
    def test_streaming_dag_equals_batch_replay(self, spark, tmp_path):
        customers_cdc, orders_cdc = make_cdc_frames(spark)

        # Land the customers feed as one time-ordered file per batch id.
        # FileStreamSource orders new files by modification time, so pin
        # each landed file to an explicit, strictly increasing mtime —
        # on coarse-mtime filesystems back-to-back writes can otherwise
        # tie (coalescing batches) or even reorder the replay.
        landing = str(tmp_path / "customers_landing")
        for i, b in enumerate(("b0", "b1", "b2")):
            customers_cdc.filter(F.col("_batch_id") == b).repartition(
                1
            ).write.mode("append").parquet(landing)
            stamp = 1_700_000_000 + i * 10
            for f in pathlib.Path(landing).glob("*.parquet"):
                if f.stat().st_mtime > stamp - 10:
                    os.utime(f, (stamp, stamp))
        schema = spark.read.parquet(landing).schema

        prev_conf = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            # Streaming run: one registry pass per arriving file.
            store_stream = SnapshotStore(spark, str(tmp_path / "wh_stream"))
            reg = build_registry(AS_OF, AS_OF_TS)
            journal = run_streaming_dag(
                spark,
                store_stream,
                reg,
                stream_source="customers_cdc",
                landing_dir=landing,
                landing_schema=schema,
                static_sources={"orders_cdc": orders_cdc},
            )
            assert len(journal) >= 3  # one trigger per landed file

            # Batch incremental replay with the same boundaries.
            store_batch = SnapshotStore(spark, str(tmp_path / "wh_batch"))
            reg2 = build_registry(AS_OF, AS_OF_TS)
            for b in ("b0", "b1", "b2"):
                reg2.run(
                    store_batch,
                    {
                        "customers_cdc": customers_cdc.filter(
                            F.col("_batch_id") == b
                        ),
                        "orders_cdc": orders_cdc,
                    },
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_conf)

        for name, key in (
            ("customers_latest", "customer_id"),
            ("orders_cleaned", "order_id"),
            ("dim_customer", "customer_id"),
        ):
            s = _snap(store_stream.read(name), key)
            bsnap = _snap(store_batch.read(name), key)
            assert s == bsnap, (
                name,
                {k: v for k, v in s.items() if bsnap.get(k) != v},
            )

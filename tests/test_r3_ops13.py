"""Unit tests for the q200-q201 streaming families
(driver_queries_ext17)."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext17 import (
    q200_streaming_merge_parity,
    q201_append_mode_finalization,
)
from product_analytics_spark.operators.dedup import latest_by_key

SF = "/root/testdata/sf0.001"


class TestStreamingMergeParity:
    def test_equals_batch_latest_by_key(self, spark):
        got = sorted(
            tuple(r) for r in q200_streaming_merge_parity(spark, SF).collect()
        )
        o = read_parquet(spark, f"{SF}/orders.parquet").select(
            "o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate"
        )
        batch = latest_by_key(
            o, key="o_custkey", order_by=("o_orderdate", "o_orderkey")
        ).select(
            "o_custkey",
            "o_orderkey",
            "o_orderstatus",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        )
        expected = sorted(tuple(r) for r in batch.collect())
        assert got == expected


class TestAppendModeFinalization:
    def test_each_window_exactly_once_and_complete(self, spark):
        rows = q201_append_mode_finalization(spark, SF).collect()
        days = [r.day for r in rows]
        assert len(days) == len(set(days))  # exactly-once emission
        ev = read_parquet(spark, f"{SF}/events.parquet")
        batch = {
            r.day: r.n
            for r in ev.groupBy(
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert {r.day: r.n_events for r in rows} == batch
        # the flush sentinel's window must never surface
        assert all(d < "2024-02-01" for d in days)

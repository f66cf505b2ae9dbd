"""Unit tests for the q160-q164 families (driver_queries_ext7):
invariants beyond the oracle — exact attribution conservation, bitmap
flag consistency, audit-report sanity."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext7 import (
    WEEK1_MASK,
    WK4_MASK,
    q160_fk_integrity_report,
    q161_golden_record,
    q162_activity_bitmap,
    q163_ushape_attribution,
    q164_drift_monitor,
)

SF = "/root/testdata/sf0.001"


class TestFkIntegrity:
    def test_all_edges_reported_and_sane(self, spark):
        rows = {r.fk_edge: r for r in q160_fk_integrity_report(spark, SF).collect()}
        assert len(rows) == 8
        for r in rows.values():
            assert r.n_orphan_rows >= 0
            assert r.n_referenced <= r.n_parent_keys
            assert r.n_referenced <= r.n_child_keys
            assert 0.0 <= r.parent_coverage <= 1.0
        # the synthetic schema is referentially clean
        assert all(r.n_orphan_rows == 0 for r in rows.values())
        # every nation belongs to a region and is referenced by customers
        assert rows["nation.regionkey->region"].parent_coverage == 1.0
        # only a minority of customers show up in the events stream
        assert rows["events.user_id->customer"].parent_coverage < 1.0


class TestGoldenRecord:
    def test_field_rules_consistent(self, spark):
        rows = q161_golden_record(spark, SF).collect()
        assert len(rows) == 150
        for r in rows:
            assert 1 <= r.priority_support <= r.n_orders
            assert r.latest_status in {"O", "F", "P"}


class TestActivityBitmap:
    def test_flags_derive_from_mask(self, spark):
        rows = q162_activity_bitmap(spark, SF).collect()
        assert rows
        for r in rows:
            assert r.activity_mask != 0
            assert r.n_active_days == bin(r.activity_mask).count("1")
            assert r.n_active_days <= 30
            assert r.active_week1 == bool(r.activity_mask & WEEK1_MASK)
            assert r.active_week4 == bool(r.activity_mask & WK4_MASK)


class TestUshapeAttribution:
    def test_exact_revenue_conservation(self, spark):
        rows = q163_ushape_attribution(spark, SF).collect()
        credited = sum(Decimal(str(r.credited_revenue)) for r in rows)
        total = (
            read_parquet(spark, f"{SF}/events.parquet")
            .filter(F.col("event_type") == "purchase")
            .agg(F.sum(F.col("value").cast("decimal(18,2)")))
            .collect()[0][0]
        )
        # integer-division credit split: conservation is exact, not approximate
        assert credited == Decimal(str(total))

    def test_channels(self, spark):
        rows = {r.channel for r in q163_ushape_attribution(spark, SF).collect()}
        assert rows <= {"click", "view", "direct"}
        assert "click" in rows and "view" in rows


class TestDriftMonitor:
    def test_shares_close_and_tv_bounded(self, spark):
        rows = q164_drift_monitor(spark, SF).collect()
        assert abs(sum(r.share_pre for r in rows) - 1.0) < 1e-4
        assert abs(sum(r.share_post for r in rows) - 1.0) < 1e-4
        tv = rows[0].tv_distance
        assert all(r.tv_distance == tv for r in rows)
        assert 0.0 <= tv <= 1.0
